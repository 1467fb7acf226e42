"""Matcher adapters: uniform match_fn closures for the localization engine.

Equivalent of the reference's matcher plugin wrappers
(localization/matchers/*.py, localization/base_model.py): each returns a
``match_fn(d0, nk0, s0, m0, d1, nk1, s1, m1) -> matches0 [B, N]`` closure the
engine can call over a candidate batch.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from pram_tpu.models.nn_matcher import mutual_nn_match
from pram_tpu.ops.matching import mutual_matches

MatchFn = Callable[..., jax.Array]


def make_nn_match_fn(
    ratio_threshold: Optional[float] = None,
    distance_threshold: Optional[float] = None,
) -> MatchFn:
    """Mutual nearest-neighbour matcher (localization/matchers/nearest_neighbor.py)."""

    def fn(d0, nk0, s0, m0, d1, nk1, s1, m1):
        return mutual_nn_match(
            d0, d1, m0, m1, ratio_threshold, distance_threshold
        ).matches0

    return fn


def make_gml_match_fn(model, variables, threshold: float = 0.2) -> MatchFn:
    """GML matcher closure (localization/matchers/gml.py)."""

    def fn(d0, nk0, s0, m0, d1, nk1, s1, m1):
        out = model.apply(variables, d0, d1, nk0, nk1, m0, m1)
        return mutual_matches(out["plan"], threshold).matches0

    return fn


def make_adagml_match_fn(
    model,
    variables,
    threshold: float = 0.2,
    early_exit: Optional[bool] = None,
) -> MatchFn:
    """AdaGML matcher closure (localization/matchers/adagml.py).

    ``early_exit`` (default on, ``PRAM_ADA_EXIT=0`` disables) runs the
    batched while-loop formulation (models/adagml.py:
    adagml_batched_adaptive_apply): identical plan to the unrolled module,
    but layers after the point where every element has early-stopped are
    actually SKIPPED — the reference's adaptive compute saving
    (nets/adagml.py:522-531), which the unrolled static-shape module
    spends anyway. Inference-only (while_loop has no reverse-mode); the
    trainer differentiates the module directly, not this closure.
    """
    import os

    if early_exit is None:
        early_exit = os.environ.get("PRAM_ADA_EXIT", "1") == "1"
    cfg = getattr(model, "config", None)
    if early_exit and cfg is not None and cfg.adaptive:
        from pram_tpu.models.adagml import (
            adagml_batched_adaptive_apply,
            stack_adagml_layers,
        )

        stacked = stack_adagml_layers(variables, cfg.n_layers)

        def fn(d0, nk0, s0, m0, d1, nk1, s1, m1):
            out = adagml_batched_adaptive_apply(
                stacked, d0, d1, nk0, nk1, m0, m1, cfg
            )
            return mutual_matches(out["plan"], threshold).matches0

        return fn

    def fn(d0, nk0, s0, m0, d1, nk1, s1, m1):
        out = model.apply(variables, d0, d1, nk0, nk1, m0, m1)
        return mutual_matches(out["plan"], threshold).matches0

    return fn


def make_gm_match_fn(model, variables, threshold: float = 0.2) -> MatchFn:
    """GM matcher closure (localization/matchers/gm.py); uses keypoint scores."""

    def fn(d0, nk0, s0, m0, d1, nk1, s1, m1):
        out = model.apply(variables, d0, d1, nk0, nk1, s0, s1, m0, m1)
        return mutual_matches(out["plan"], threshold).matches0

    return fn


def with_scores(model, variables, threshold: float = 0.2, uses_scores=False):
    """Score-returning variant: fn(...) -> (matches0, matching_scores0)."""

    def fn(d0, nk0, s0, m0, d1, nk1, s1, m1):
        if uses_scores:
            out = model.apply(variables, d0, d1, nk0, nk1, s0, s1, m0, m1)
        else:
            out = model.apply(variables, d0, d1, nk0, nk1, m0, m1)
        res = mutual_matches(out["plan"], threshold)
        return res.matches0, res.scores0

    return fn


def nn_with_scores(
    ratio_threshold: Optional[float] = None,
    distance_threshold: Optional[float] = None,
):
    def fn(d0, nk0, s0, m0, d1, nk1, s1, m1):
        res = mutual_nn_match(
            d0, d1, m0, m1, ratio_threshold, distance_threshold
        )
        return res.matches0, res.scores0

    return fn
