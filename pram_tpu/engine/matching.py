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


def make_adagml_match_fn(model, variables, threshold: float = 0.2) -> MatchFn:
    """AdaGML matcher closure (localization/matchers/adagml.py)."""

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
