"""Profiling seams: trace-time stop-gradient injection points.

The train step's backward pass is ~2/3 of its wall clock but is a single
fused XLA program — there is no stage boundary to hand-time. These seams
let a profiling tool (tools/profile_bwd.py) cut the gradient graph at a
named point and re-jit, so the *backward* cost of each segment is measured
as a delta between two otherwise-identical compiled steps (the same
cumulative-ablation methodology as the forward ladders in docs/DESIGN.md
section 9d/9e; the reference's equivalent attribution tooling is hand-timed
phase logs, omni3d_evaluation.py:548-631).

SG_STAGES is read at TRACE time: a tool sets it, re-jits, measures, and
resets it. Production code paths never set it, so the hooks are exact
identities in every shipped program.
"""
from __future__ import annotations

import jax

# Names understood by the hooks below (see call sites):
#   "trunk"   — backbone+FPN features (meta_arch / weak_arch)
#   "pool"    — pooled ROI blocks (roi_heads3d._pool)
#   "rpnhead" — RPN head logits/deltas (meta_arch)
SG_STAGES: frozenset = frozenset()


def sg(tag: str, x):
    """stop_gradient(x) iff `tag` is enabled; identity otherwise."""
    if tag in SG_STAGES:
        return jax.tree.map(jax.lax.stop_gradient, x)
    return x
