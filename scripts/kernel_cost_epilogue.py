"""Pallas kernels: fused bilinear tap-reduce + cost-volume accumulation.

STATUS: measured SLOWER than the XLA formulation now used by
ops/plane_sweep.py and therefore NOT on the production path. On this
toolchain Mosaic's auto-pipelined DMA tops out at ~85 GB/s per stream (a
plain copy kernel measures the same, scripts/probe_epi3.py), an order of
magnitude under what the XLA fusion achieves for the same data movement.
The production epilogue instead expands tap weights with constant lane
masks and collapses the tap blocks with a stacked-identity MXU matmul —
see ops/plane_sweep.py. Kept as working, numerically validated Pallas
infrastructure (fwd bit-exact vs the XLA formulation, custom-VJP grads to
~1e-4 rel; scripts/probe_epilogue.py).

Computes, in ONE pass over the gathered data, everything the plane sweep
does after its gathers (behavioral targets: the reference's incremental
variance aggregation /root/reference/models/mvsnet.py:139-168 and groupwise
correlation /root/reference/models/mvsnet.py:157-171):

    o_v[n, c]   = sum_q w_v[n, q] * rows_v[n, q*C + c]        (4-tap bilinear)
    var[n, c]   = (ref^2 + sum_v o_v^2) / V - ((ref + sum_v o_v) / V)^2
    corr[n, g]  = sum_v mean_{c in g}(o_v[n, c] * ref[n, c]) / (V - 1)

Why a kernel: XLA lowers the per-sample-scalar x lane-vector tap combine
through a transposed f32 copy and a while loop (~7.6 ms per 2.6M-sample view
on v5e), then streams two f32 (B,D,H,W,C) accumulator volumes through HBM
per source view (~23 ms/level measured, scripts/probe_l0_variants.py). Here
everything after the gathers lives in VMEM registers: the gathered quad rows
are read once and the finished bf16 cost volume is written once.

Layout rules that make it fast (v5e measurements):
  * weights arrive as (N, 4) float32 — lane-minor — so each tap combine is a
    (T, 1) x (T, C) lane-broadcast multiply, a native VPU op. (The earlier
    kernels/tap_reduce.py used (4, N) weights and paid an in-kernel
    transpose that cost more than XLA's whole lowering.)
  * grid order is (B, hw/T, D): the reference-feature block index (b, p) is
    constant across the inner D steps, so Mosaic skips its re-DMA, and the
    backward kernel accumulates d ref across D in VMEM without ever
    materializing a (B, D, hw, C) f32 gradient volume.

Both kernels have custom VJPs (training path):
    m = (ref + sum_v o_v) / V
    d o_v = g * 2/V * (o_v - m);  d ref = sum_d g * 2/V * (ref - m)
    d rows_v[n, q*C+c] = w_v[n, q] * d o_v[n, c]
    d w_v[n, q]        = sum_c rows_v[n, q*C+c] * d o_v[n, c]
On CPU and for unsupported shapes, a mathematically identical pure-XLA
formulation runs instead; tests/test_cost_epilogue.py pins that fallback
(forward + custom VJPs) against an independent autodiff formulation, and
scripts/probe_epilogue.py validates the Pallas kernels against it on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MAX_TILE = 1024       # VMEM-bounded: the kernels hold several (T, 4C) live
_MAX_TILE_BWD = 1024   # vectors; T=4096 at C=32 blows the 16 MB scoped limit


def _tile_for(hw: int, max_tile: int = _MAX_TILE) -> int | None:
    t = max_tile
    while t >= 16:
        if hw % t == 0:
            return t
        t //= 2
    return None


def _use_kernel(hw: int) -> bool:
    return jax.default_backend() == "tpu" and _tile_for(hw) is not None


def _taps(rows: Array, wv: Array, C: int) -> Array:
    """(T, 4C) rows x (T, 4) weights -> (T, C) f32 bilinear sample.

    Slices the bf16 rows BEFORE upcasting so no (T, 4C) f32 copy is live.
    """
    o = rows[:, 0:C].astype(jnp.float32) * wv[:, 0:1]
    for q in range(1, 4):
        o = o + rows[:, q * C:(q + 1) * C].astype(jnp.float32) * wv[:, q:q + 1]
    return o


# ---------------------------------------------------------------------------
# variance
# ---------------------------------------------------------------------------

def _var_fwd_kernel(ref_ref, *args, n_views: int, C: int):
    rows_refs = args[:n_views]
    w_refs = args[n_views:2 * n_views]
    out_ref = args[2 * n_views]
    ref = ref_ref[0].astype(jnp.float32)                  # (T, C)
    s = ref
    sq = ref * ref
    for v in range(n_views):
        o = _taps(rows_refs[v][0, 0], w_refs[v][0, 0], C)
        s = s + o
        sq = sq + o * o
    inv_v = 1.0 / (n_views + 1)
    m = s * inv_v
    out_ref[0, 0] = (sq * inv_v - m * m).astype(out_ref.dtype)


def _var_bwd_kernel(ref_ref, *args, n_views: int, C: int):
    rows_refs = args[:n_views]
    w_refs = args[n_views:2 * n_views]
    g_ref = args[2 * n_views]
    dref_ref = args[2 * n_views + 1]
    drows_refs = args[2 * n_views + 2:2 * n_views + 2 + n_views]
    dw_refs = args[2 * n_views + 2 + n_views:]

    d = pl.program_id(2)
    ref = ref_ref[0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    os = []
    s = ref
    for v in range(n_views):
        o = _taps(rows_refs[v][0, 0], w_refs[v][0, 0], C)
        os.append(o)
        s = s + o
    inv_v = 1.0 / (n_views + 1)
    m = s * inv_v
    scale = 2.0 * inv_v

    @pl.when(d == 0)
    def _():
        dref_ref[0] = jnp.zeros_like(dref_ref[0])

    dref_ref[0] += g * scale * (ref - m)
    for v in range(n_views):
        do = g * scale * (os[v] - m)                      # (T, C)
        wv = w_refs[v][0, 0]
        parts, dws = [], []
        for q in range(4):
            rq = rows_refs[v][0, 0][:, q * C:(q + 1) * C].astype(jnp.float32)
            parts.append(do * wv[:, q:q + 1])
            dws.append(jnp.sum(rq * do, axis=1, keepdims=True))
        drows_refs[v][0, 0] = jnp.concatenate(
            parts, axis=1).astype(drows_refs[v].dtype)
        dw_refs[v][0, 0] = jnp.concatenate(dws, axis=1)   # (T, 4) f32


def _grid_specs(B: int, D: int, hw: int, C: int, T: int):
    grid = (B, hw // T, D)
    ref_spec = pl.BlockSpec((1, T, C), lambda b, p, d: (b, p, 0),
                            memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((1, 1, T, 4 * C), lambda b, p, d: (b, d, p, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 1, T, 4), lambda b, p, d: (b, d, p, 0),
                          memory_space=pltpu.VMEM)
    return grid, ref_spec, rows_spec, w_spec


def _var_xla(ref, rows, ws, out_dtype):
    """Pure-XLA formulation: CPU fallback and the oracle in tests."""
    n_views = len(rows)
    C = ref.shape[-1]
    reff = ref[:, None].astype(jnp.float32)               # (B, 1, hw, C)
    s = jnp.broadcast_to(reff, rows[0].shape[:3] + (C,))
    sq = s * s
    for v in range(n_views):
        r = rows[v].astype(jnp.float32)
        w = ws[v]
        o = sum(r[..., q * C:(q + 1) * C] * w[..., q:q + 1] for q in range(4))
        s = s + o
        sq = sq + o * o
    inv_v = 1.0 / (n_views + 1)
    m = s * inv_v
    return (sq * inv_v - m * m).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def variance_epilogue(ref, rows, ws, out_dtype=jnp.bfloat16):
    """Fused tap-reduce + variance across views.

    Args:
      ref:  (B, hw, C) reference features (any float dtype).
      rows: tuple of (B, D, hw, 4C) gathered quad rows, one per source view.
      ws:   tuple of (B, D, hw, 4) float32 tap weights (zeros where invalid).
    Returns:
      (B, D, hw, C) variance volume in out_dtype.
    """
    rows, ws = tuple(rows), tuple(ws)
    B, D, hw, C4 = rows[0].shape
    C = C4 // 4
    if not _use_kernel(hw):
        return _var_xla(ref, rows, ws, out_dtype)
    T = _tile_for(hw)
    grid, ref_spec, rows_spec, w_spec = _grid_specs(B, D, hw, C, T)
    out_spec = pl.BlockSpec((1, 1, T, C), lambda b, p, d: (b, d, p, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_var_fwd_kernel, n_views=len(rows), C=C),
        grid=grid,
        in_specs=[ref_spec] + [rows_spec] * len(rows) + [w_spec] * len(ws),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, hw, C), out_dtype),
    )(ref, *rows, *ws)


def _var_vjp_fwd(ref, rows, ws, out_dtype):
    return variance_epilogue(ref, rows, ws, out_dtype), (ref, tuple(rows),
                                                         tuple(ws))


def _var_vjp_bwd(out_dtype, res, g):
    ref, rows, ws = res
    n_views = len(rows)
    B, D, hw, C4 = rows[0].shape
    C = C4 // 4
    if not _use_kernel(hw):
        return _var_bwd_xla(ref, rows, ws, g)
    T = _tile_for(hw, _MAX_TILE_BWD)
    grid, ref_spec, rows_spec, w_spec = _grid_specs(B, D, hw, C, T)
    g_spec = pl.BlockSpec((1, 1, T, C), lambda b, p, d: (b, d, p, 0),
                          memory_space=pltpu.VMEM)
    dref_spec = pl.BlockSpec((1, T, C), lambda b, p, d: (b, p, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_var_bwd_kernel, n_views=n_views, C=C),
        grid=grid,
        in_specs=[ref_spec] + [rows_spec] * n_views + [w_spec] * n_views
        + [g_spec],
        out_specs=[dref_spec] + [rows_spec] * n_views + [w_spec] * n_views,
        out_shape=(
            [jax.ShapeDtypeStruct((B, hw, C), jnp.float32)]
            + [jax.ShapeDtypeStruct((B, D, hw, C4), rows[v].dtype)
               for v in range(n_views)]
            + [jax.ShapeDtypeStruct((B, D, hw, 4), jnp.float32)] * n_views
        ),
    )(ref, *rows, *ws, g)
    dref = outs[0].astype(ref.dtype)
    return dref, tuple(outs[1:1 + n_views]), tuple(outs[1 + n_views:])


def _var_bwd_xla(ref, rows, ws, g):
    n_views = len(rows)
    C = ref.shape[-1]
    gf = g.astype(jnp.float32)
    reff = ref[:, None].astype(jnp.float32)
    os = []
    s = jnp.broadcast_to(reff, rows[0].shape[:3] + (C,))
    for v in range(n_views):
        r = rows[v].astype(jnp.float32)
        w = ws[v]
        o = sum(r[..., q * C:(q + 1) * C] * w[..., q:q + 1] for q in range(4))
        os.append(o)
        s = s + o
    inv_v = 1.0 / (n_views + 1)
    m = s * inv_v
    scale = 2.0 * inv_v
    dref = jnp.sum(gf * scale * (reff - m), axis=1).astype(ref.dtype)
    drows, dws = [], []
    for v in range(n_views):
        do = gf * scale * (os[v] - m)
        r = rows[v].astype(jnp.float32)
        drows.append(jnp.concatenate(
            [do * ws[v][..., q:q + 1] for q in range(4)],
            axis=-1).astype(rows[v].dtype))
        dws.append(jnp.stack(
            [jnp.sum(r[..., q * C:(q + 1) * C] * do, axis=-1)
             for q in range(4)], axis=-1))
    return dref, tuple(drows), tuple(dws)


variance_epilogue.defvjp(_var_vjp_fwd, _var_vjp_bwd)


# ---------------------------------------------------------------------------
# groupwise correlation
# ---------------------------------------------------------------------------

def _group_matrix(C: int, G: int, transposed: bool = False):
    """(C, G) (or (G, C)) 0/1 group-assignment matrix, built in-register.

    Mosaic cannot shape-cast (T, C) -> (T, G, C/G) across lanes, so the
    per-group channel reduction runs as a tiny MXU matmul instead. The
    transposed variant is built directly (no in-kernel transpose op).
    """
    cg = C // G
    shape = (G, C) if transposed else (C, G)
    cidx = jax.lax.broadcasted_iota(jnp.int32, shape, 1 if transposed else 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if transposed else 1)
    return (cidx // cg == gidx).astype(jnp.float32)


def _gw_fwd_kernel(ref_ref, *args, n_views: int, C: int, G: int):
    rows_refs = args[:n_views]
    w_refs = args[n_views:2 * n_views]
    out_ref = args[2 * n_views]
    T = ref_ref.shape[1]
    ref = ref_ref[0].astype(jnp.float32)                  # (T, C)
    cg = C // G
    gmat = _group_matrix(C, G)
    acc = jnp.zeros((T, G), jnp.float32)
    for v in range(n_views):
        o = _taps(rows_refs[v][0, 0], w_refs[v][0, 0], C)
        acc = acc + jnp.dot(o * ref, gmat,
                            preferred_element_type=jnp.float32)
    out_ref[0, 0] = (acc / (cg * n_views)).astype(out_ref.dtype)


def _gw_bwd_kernel(ref_ref, *args, n_views: int, C: int, G: int):
    rows_refs = args[:n_views]
    w_refs = args[n_views:2 * n_views]
    g_ref = args[2 * n_views]
    dref_ref = args[2 * n_views + 1]
    drows_refs = args[2 * n_views + 2:2 * n_views + 2 + n_views]
    dw_refs = args[2 * n_views + 2 + n_views:]

    d = pl.program_id(2)
    T = ref_ref.shape[1]
    cg = C // G
    ref = ref_ref[0].astype(jnp.float32)
    # d out[g] / d (o*ref)[c] = 1/(cg*n_views) for c in group g
    gout = g_ref[0, 0].astype(jnp.float32)                # (T, G)
    gexp = jnp.dot(gout, _group_matrix(C, G, transposed=True),
                   preferred_element_type=jnp.float32) / (cg * n_views)

    @pl.when(d == 0)
    def _():
        dref_ref[0] = jnp.zeros_like(dref_ref[0])

    dref_acc = jnp.zeros((T, C), jnp.float32)
    do = gexp * ref                                       # (T, C), view-indep
    for v in range(n_views):
        o = _taps(rows_refs[v][0, 0], w_refs[v][0, 0], C)
        dref_acc = dref_acc + gexp * o
        wv = w_refs[v][0, 0]
        parts, dws = [], []
        for q in range(4):
            rq = rows_refs[v][0, 0][:, q * C:(q + 1) * C].astype(jnp.float32)
            parts.append(do * wv[:, q:q + 1])
            dws.append(jnp.sum(rq * do, axis=1, keepdims=True))
        drows_refs[v][0, 0] = jnp.concatenate(
            parts, axis=1).astype(drows_refs[v].dtype)
        dw_refs[v][0, 0] = jnp.concatenate(dws, axis=1)
    dref_ref[0] += dref_acc


def _gw_xla(ref, rows, ws, groups, out_dtype):
    n_views = len(rows)
    B, D, hw, C4 = rows[0].shape
    C = C4 // 4
    cg = C // groups
    reff = ref[:, None].astype(jnp.float32)
    acc = jnp.zeros((B, D, hw, groups), jnp.float32)
    for v in range(n_views):
        r = rows[v].astype(jnp.float32)
        w = ws[v]
        o = sum(r[..., q * C:(q + 1) * C] * w[..., q:q + 1] for q in range(4))
        prod = (o * reff).reshape(B, D, hw, groups, cg)
        acc = acc + jnp.mean(prod, axis=-1)
    return (acc / n_views).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def groupwise_epilogue(ref, rows, ws, groups, out_dtype=jnp.bfloat16):
    """Fused tap-reduce + groupwise correlation across views.

    Args as :func:`variance_epilogue`; returns (B, D, hw, groups).
    """
    rows, ws = tuple(rows), tuple(ws)
    B, D, hw, C4 = rows[0].shape
    C = C4 // 4
    if not _use_kernel(hw) or C % groups:
        return _gw_xla(ref, rows, ws, groups, out_dtype)
    T = _tile_for(hw)
    grid, ref_spec, rows_spec, w_spec = _grid_specs(B, D, hw, C, T)
    out_spec = pl.BlockSpec((1, 1, T, groups), lambda b, p, d: (b, d, p, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gw_fwd_kernel, n_views=len(rows), C=C, G=groups),
        grid=grid,
        in_specs=[ref_spec] + [rows_spec] * len(rows) + [w_spec] * len(ws),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, hw, groups), out_dtype),
    )(ref, *rows, *ws)


def _gw_vjp_fwd(ref, rows, ws, groups, out_dtype):
    return (groupwise_epilogue(ref, rows, ws, groups, out_dtype),
            (ref, tuple(rows), tuple(ws)))


def _gw_vjp_bwd(groups, out_dtype, res, g):
    ref, rows, ws = res
    n_views = len(rows)
    B, D, hw, C4 = rows[0].shape
    C = C4 // 4
    if not _use_kernel(hw) or C % groups:
        return _gw_bwd_xla(ref, rows, ws, groups, g)
    T = _tile_for(hw, _MAX_TILE_BWD)
    grid, ref_spec, rows_spec, w_spec = _grid_specs(B, D, hw, C, T)
    g_spec = pl.BlockSpec((1, 1, T, groups), lambda b, p, d: (b, d, p, 0),
                          memory_space=pltpu.VMEM)
    dref_spec = pl.BlockSpec((1, T, C), lambda b, p, d: (b, p, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_gw_bwd_kernel, n_views=n_views, C=C, G=groups),
        grid=grid,
        in_specs=[ref_spec] + [rows_spec] * n_views + [w_spec] * n_views
        + [g_spec],
        out_specs=[dref_spec] + [rows_spec] * n_views + [w_spec] * n_views,
        out_shape=(
            [jax.ShapeDtypeStruct((B, hw, C), jnp.float32)]
            + [jax.ShapeDtypeStruct((B, D, hw, C4), rows[v].dtype)
               for v in range(n_views)]
            + [jax.ShapeDtypeStruct((B, D, hw, 4), jnp.float32)] * n_views
        ),
    )(ref, *rows, *ws, g)
    dref = outs[0].astype(ref.dtype)
    return dref, tuple(outs[1:1 + n_views]), tuple(outs[1 + n_views:])


def _gw_bwd_xla(ref, rows, ws, groups, g):
    n_views = len(rows)
    B, D, hw, C4 = rows[0].shape
    C = C4 // 4
    cg = C // groups
    reff = ref[:, None].astype(jnp.float32)
    gexp = jnp.repeat(g.astype(jnp.float32), cg, axis=-1) / (cg * n_views)
    dref = jnp.zeros_like(reff)
    drows, dws = [], []
    for v in range(n_views):
        r = rows[v].astype(jnp.float32)
        w = ws[v]
        o = sum(r[..., q * C:(q + 1) * C] * w[..., q:q + 1] for q in range(4))
        do = gexp * reff
        dref = dref + gexp * o
        drows.append(jnp.concatenate(
            [do * w[..., q:q + 1] for q in range(4)],
            axis=-1).astype(rows[v].dtype))
        dws.append(jnp.stack(
            [jnp.sum(r[..., q * C:(q + 1) * C] * do, axis=-1)
             for q in range(4)], axis=-1))
    return (jnp.sum(dref, axis=1).astype(ref.dtype), tuple(drows),
            tuple(dws))


groupwise_epilogue.defvjp(_gw_vjp_fwd, _gw_vjp_bwd)
