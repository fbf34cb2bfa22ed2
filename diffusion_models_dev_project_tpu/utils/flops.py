"""Analytic matmul/conv FLOP counting from a jaxpr.

XLA:TPU's `compiled.cost_analysis()` under-reports convolution FLOPs on
this backend (observed: ~50× low for the 256² UNet), so bench.py derives
its MFU companion number from the jaxpr instead: walk every equation,
count 2·M·N·K for `dot_general` and 2·|out|·(Cin/g)·kh·kw for
`conv_general_dilated`, and recurse through `scan` (×length), `while`
(×1 — a lower bound), `cond`/`custom_*`/`pjit` sub-jaxprs.

Counts multiply-adds as 2 FLOPs; elementwise work is excluded (on the
MXU-dominated UNet it is ≪1% of the total).
"""
from __future__ import annotations

import math

import jax

__all__ = ["jaxpr_flops", "fn_flops"]


def _eqn_flops(eqn) -> float:
    name = eqn.primitive.name
    if name == "dot_general":
        ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
        lhs = eqn.invars[0].aval.shape
        rhs = eqn.invars[1].aval.shape
        batch = math.prod(lhs[d] for d in lb) if lb else 1
        k = math.prod(lhs[d] for d in lc) if lc else 1
        m = math.prod(lhs[d] for d in range(len(lhs))
                      if d not in lb and d not in lc)
        n = math.prod(rhs[d] for d in range(len(rhs))
                      if d not in rb and d not in rc)
        return 2.0 * batch * m * n * k
    if name == "conv_general_dilated":
        # each output element: (Cin/groups)·kh·kw MACs — grouping already
        # reflected in the kernel's per-group input-channel dim
        dn = eqn.params["dimension_numbers"]
        rhs = eqn.invars[1].aval.shape
        out = eqn.outvars[0].aval.shape
        k_spatial = math.prod(rhs[d] for d in dn.rhs_spec[2:])
        cin_per_group = rhs[dn.rhs_spec[1]]
        return 2.0 * math.prod(out) * cin_per_group * k_spatial
    return 0.0


def _sub_jaxprs(eqn):
    """(jaxpr, multiplier) pairs for higher-order primitives."""
    name = eqn.primitive.name
    p = eqn.params
    if name == "scan":
        yield p["jaxpr"].jaxpr, float(p["length"])
    elif name == "while":
        yield p["cond_jaxpr"].jaxpr, 1.0     # lower bound: one trip
        yield p["body_jaxpr"].jaxpr, 1.0
    elif name == "pallas_call":
        # the kernel jaxpr computes ONE grid cell; total = kernel × |grid|
        # (without this, the generic branch below counts a single tile and
        # bench MFU under-reports — observed 12.4% vs 41.7% actual for the
        # 9-shift conv UNet, BENCH.md r5)
        grid = getattr(p.get("grid_mapping"), "grid", ())
        mult = 1.0
        for g in grid:
            try:
                mult *= float(g)
            except (TypeError, ValueError):   # symbolic dim: keep bound
                pass
        sub = p.get("jaxpr")
        if sub is not None:
            yield getattr(sub, "jaxpr", sub), mult
    elif name == "cond":
        branches = p["branches"]
        # take the max-cost branch (can't know which executes)
        costs = [(_jaxpr_flops(b.jaxpr), b.jaxpr) for b in branches]
        if costs:
            cost, jpr = max(costs, key=lambda t: t[0])
            yield jpr, 1.0
    else:
        for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
            if key in p:
                sub = p[key]
                yield getattr(sub, "jaxpr", sub), 1.0
                break    # a primitive carrying two of these aliases the
                         # same program — yielding both double-counts


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        total += _eqn_flops(eqn)
        for sub, mult in _sub_jaxprs(eqn):
            total += mult * _jaxpr_flops(sub)
    return total


def jaxpr_flops(closed_jaxpr) -> float:
    """Total matmul/conv FLOPs of a (closed) jaxpr, scan-aware."""
    return _jaxpr_flops(getattr(closed_jaxpr, "jaxpr", closed_jaxpr))


def fn_flops(fn, *args, **kwargs) -> float:
    """FLOPs of `fn(*args)` via abstract tracing (no execution)."""
    return jaxpr_flops(jax.make_jaxpr(fn, **kwargs)(*args))
