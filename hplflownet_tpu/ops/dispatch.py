"""Trace-time dispatch switches shared by the lattice ops.

``exact_mode`` disables every *windowed* fast path — the fused rank-reduce
splat (ops/segment._wr_rank_fused), the windowed probes
(lattice/build._probe_rows_sorted) and the windowed Pallas stencil kernels
(ops/pallas_stencil) — routing to their exact, window-free counterparts
(blocked partial + combine, sort-merge join probe, XLA gather+matmul).
Those fast paths degrade out-of-window work to "absent" and surface the
drop through the pyramid's overflow counters (zero on realistic clouds; the
corr probe window overflows ~1/600 FT3D pairs).  The training driver skips
such batches; the *inference* driver instead re-runs the batch through an
exact-mode step traced under this context manager, so evaluation results
never silently degrade (reference parity: the torch ops are always exact).

The contextvar is read at TRACE time (the jitted function's Python body
runs under ``jax.jit`` tracing), so a wrapper like::

    def eval_exact(params, batch):
        with exact_mode():
            return eval_fn(params, batch)

compiles a fully exact graph.  Capacity overflow (more occupied vertices
than the static per-scale capacity) is NOT recoverable this way — raise
``lattice_capacities`` for that; it stays counted in exact mode.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

__all__ = ["exact_mode", "exact_mode_active", "rank_fused_enabled"]

_EXACT_MODE: contextvars.ContextVar = contextvars.ContextVar(
    "exact_mode", default=False)


@contextlib.contextmanager
def exact_mode(enabled: bool = True):
    """Route every windowed fast path to its exact fallback while tracing."""
    token = _EXACT_MODE.set(bool(enabled))
    try:
        yield
    finally:
        _EXACT_MODE.reset(token)


def exact_mode_active() -> bool:
    return _EXACT_MODE.get()


def rank_fused_enabled() -> bool:
    """Fused single-pass rank reduction (ops/segment._wr_rank_fused).

    DEFAULT OFF: the single-pass kernel re-reads ~2 windows of the sorted
    stream per 1024-rank super-block, and at the model's M/T ratios that
    amplification beats the partial-plane traffic it saves — measured
    30.9 ms fwd / 69.0 ms train with it on vs 23.7 / 62 off (TPU v5e,
    8192-pt pairs, 2026-08-19).  Kept behind HPL_RANK_FUSED=1 for shapes
    where it could win (very wide C with high T/M) and for the tests.
    """
    if _EXACT_MODE.get():
        return False
    return os.environ.get("HPL_RANK_FUSED", "0") == "1"
