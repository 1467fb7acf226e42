"""Int8 extractor experiment (VERDICT r3 #3): accuracy + in-context speed.

Runs the image-level rendered guard twice — float (bf16) extractor vs the
int8 quantized path (models/sfd2_int8.py) — and reports:
  - recall/match-precision through the FULL pipeline for both (the
    correctness gate: int8 must hold recall 1.0);
  - dense-output quantization error (descriptor cosine, score-map corr);
  - in-context pipeline fps for both variants (same batch, same engine —
    the only difference is the extractor), which is the trustworthy way to
    time on the relay chip (standalone microbenchmarks are inflated AND
    dedupe-cached; ROUND_NOTES r2/r3).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from pram_tpu.engine.rendered_guard import RenderedGuard

    out = {"metric": "int8_extractor_experiment"}

    guards = {}
    for name, int8 in (("float", False), ("int8", True)):
        g = RenderedGuard(batch=32, int8=int8)
        guards[name] = g
        r = g.recall(n_queries=128, noise=True)
        out[f"recall_{name}"] = r["recall"]
        out[f"precision_{name}"] = r["match_precision"]

    # dense-output quantization error on shared query images
    gf, gq = guards["float"], guards["int8"]
    imgs, _, _ = gf._queries_raw(8, 21)
    from pram_tpu.models.sfd2 import extract, preprocess_image

    def dense(g, images):
        feats = extract(
            g.sfd2, g.sfd2_vars,
            preprocess_image(jnp.asarray(images)).astype(g.compute_dtype),
            max_keypoints=512, conf_th=1e-4,
        )
        return feats

    ff = dense(gf, imgs)
    fq = dense(gq, imgs)
    mf = np.asarray(ff["keypoints"].mask)
    mq = np.asarray(fq["keypoints"].mask)
    kf = {tuple(k) for i in range(8) for k in
          np.asarray(ff["keypoints"].xy[i], int)[mf[i]].tolist()}
    kq = {tuple(k) for i in range(8) for k in
          np.asarray(fq["keypoints"].xy[i], int)[mq[i]].tolist()}
    out["kpt_set_agreement"] = round(
        len(kf & kq) / max(len(kf | kq), 1), 4
    )

    # in-context fps: time each guard's compiled pipeline on one batch
    imgs32, _, _ = gf._queries_raw(32, 22)
    key = jax.random.PRNGKey(0)

    def fps(g):
        x = jnp.asarray(imgs32)
        r = g.pipeline(key, x)
        jax.block_until_ready(r.qvec)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(8):
                r = g.pipeline(jax.random.fold_in(key, i), x)
            jax.block_until_ready(r.qvec)
            runs.append(round(32 * 8 / (time.perf_counter() - t0), 2))
        return runs

    out["fps_float_runs"] = fps(gf)
    out["fps_int8_runs"] = fps(gq)
    out["fps_float"] = float(np.median(out["fps_float_runs"]))
    out["fps_int8"] = float(np.median(out["fps_int8_runs"]))
    out["speedup"] = round(out["fps_int8"] / out["fps_float"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
