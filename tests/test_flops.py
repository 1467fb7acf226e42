"""FLOP accounting / MFU math (pram_tpu/utils/flops.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.utils.flops import (
    V5E_BF16_PEAK,
    V5E_S8_PEAK,
    compiled_flops,
    extractor_issued_flops,
    mfu_fields,
)


def test_compiled_flops_matches_matmul():
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 512), jnp.float32)
    f = compiled_flops(jax.jit(lambda x, y: x @ y), a, b)
    assert f is not None
    # 2*M*N*K, allow backend accounting slack
    assert abs(f - 2 * 128 * 512 * 256) / (2 * 128 * 512 * 256) < 0.1


def test_compiled_flops_counts_attention_matmuls():
    """Regression for the chip-backend undercount (r5): the counting
    backend must include the N x N attention dots, which the relay
    plugin's cost analysis silently dropped (31.7 vs 355.9 GF/frame on
    the 4096-token recognizer twin). compiled_flops counts on a CPU
    lowering, so softmax(QK^T)V must cost >= 2 * 2*N*N*D."""
    n, d = 1024, 128
    q = jnp.zeros((1, n, d), jnp.float32)

    def attn(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k)
        return jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)

    f = compiled_flops(jax.jit(attn), q, q, q)
    assert f is not None
    assert f >= 2 * (2 * n * n * d)  # both N^2 matmuls present


def test_pallas_disabled_forces_gates_off():
    from pram_tpu.utils.pallas_gate import (
        pallas_disabled,
        pallas_ok,
        tpu_pallas_ok,
    )

    assert pallas_ok()
    with pallas_disabled():
        assert not pallas_ok()
        assert not tpu_pallas_ok()
        # the model-level gates must follow (they pick Mosaic kernels,
        # which cannot lower for the CPU counting backend)
        from pram_tpu.models.common import (
            int8_mlp_enabled,
            int8_proj_enabled,
            use_fused_attention,
        )

        assert not use_fused_attention()
        assert not int8_proj_enabled()
        assert not int8_mlp_enabled()
        # nesting restores correctly
        with pallas_disabled():
            assert not pallas_ok()
        assert not pallas_ok()
    assert pallas_ok()


def test_extractor_table_sane():
    bf16, s8 = extractor_issued_flops(480, 640)
    total = bf16 + s8
    # the bench docstring's long-standing roofline: ~125 GF useful,
    # ~165-185 GF issued at 480x640
    assert 120e9 < total < 220e9
    # stem + 1x1 heads are a small bf16 slice; the conv stack is s8
    assert 0.85 < s8 / total < 0.99
    # quarter resolution -> quarter flops
    bf16_h, s8_h = extractor_issued_flops(240, 320)
    assert abs((bf16_h + s8_h) * 4 - total) / total < 1e-6


def test_mfu_fields_math():
    # pure bf16: 197 TFLOP/s at peak == mfu 1.0
    f = 1e9
    fps = V5E_BF16_PEAK / f
    out = mfu_fields(f, fps, 0.0)
    assert abs(out["mfu"] - 1.0) < 1e-6
    assert abs(out["tflops"] - 197.0) < 0.5
    # all-s8 workload at the s8 peak is also mfu 1.0
    out = mfu_fields(f, V5E_S8_PEAK / f, f)
    assert abs(out["mfu"] - 1.0) < 1e-6
    # half s8: sol time = 0.5/197 + 0.5/394 per GF
    out = mfu_fields(f, fps, 0.5 * f)
    assert abs(out["mfu"] - 0.75) < 1e-6
    assert out["s8_flop_fraction"] == 0.5
    # degenerate inputs -> nulls, not crashes
    assert mfu_fields(None, 100.0)["mfu"] is None
    assert mfu_fields(0.0, 100.0)["mfu"] is None
    assert mfu_fields(1e9, 0.0)["mfu"] is None
