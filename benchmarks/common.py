"""Shared helpers for the benchmark scripts."""

from __future__ import annotations


def percentiles_ms(samples_s: list, ndigits: int | None = None) -> dict:
    """p50/p95 of a list of second-valued samples, reported in ms.

    ONE index convention for every benchmark (run_all, serve_bench):
    p50 = middle element, p95 = index int(n*0.95) clamped to the last —
    so percentiles in results.json and serving_results.json stay
    comparable.
    """
    ordered = sorted(samples_s)
    p50 = ordered[len(ordered) // 2] * 1e3
    p95 = ordered[min(len(ordered) - 1, int(len(ordered) * 0.95))] * 1e3
    if ndigits is not None:
        p50, p95 = round(p50, ndigits), round(p95, ndigits)
    return {"p50_ms": p50, "p95_ms": p95}
