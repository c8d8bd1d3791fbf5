"""Convergence-order harness (Util/Convergence_scripts equivalents:
multiRuns.py resolution ladders + pprocConvOrder.py order fits)."""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Sequence


def convergence_order(
    run_at: Callable[[int], "np.ndarray"],
    error_of: Callable[["np.ndarray", int], float],
    resolutions: Sequence[int],
) -> Dict:
    """Run a resolution ladder and fit the convergence order.

    run_at(n): run the problem at resolution n, return the solution field.
    error_of(sol, n): error norm vs the exact/reference solution.
    Returns {"errors": [...], "orders": [...], "order": mean fitted order}.
    """
    errors = [float(error_of(run_at(n), n)) for n in resolutions]
    orders: List[float] = []
    for i in range(1, len(resolutions)):
        h_ratio = resolutions[i] / resolutions[i - 1]
        orders.append(math.log(errors[i - 1] / errors[i]) / math.log(h_ratio))
    return {
        "errors": errors,
        "orders": orders,
        "order": sum(orders) / len(orders) if orders else float("nan"),
    }


def richardson_order(coarse, medium, fine, ratio: int = 2) -> float:
    """Order from three nested solutions without an exact answer
    (diffsamedomain-style): p = log(|c-m|/|m-f|)/log(ratio), where each
    comparison restricts the finer field to the coarser grid."""
    import numpy as np

    def restrict(a, r):
        out = np.asarray(a, dtype=np.float64)
        for d in range(out.ndim):
            m = out.shape[d] // r
            acc = None
            for k in range(r):
                idx = [slice(None)] * out.ndim
                idx[d] = slice(k, k + r * m, r)
                t = out[tuple(idx)]
                acc = t if acc is None else acc + t
            out = acc / r
        return out

    e1 = np.sqrt(np.mean((np.asarray(coarse) - restrict(medium, ratio)) ** 2))
    e2 = np.sqrt(np.mean((np.asarray(medium) - restrict(fine, ratio)) ** 2))
    return float(np.log(e1 / e2) / np.log(ratio))
