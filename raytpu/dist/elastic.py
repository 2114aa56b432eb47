"""Failure detection + elastic recovery for batch renders (SURVEY.md §5).

The reference has none of this: a crashed render thread would silently hang
the Join barrier (RayTracer.cs:117-120), and a crashed animation could only
be salvaged manually by re-stitching the frame PNGs already on disk
(Game1.cs:156-161, :192-210).

The TPU-native story exploits that rendering is stateless and tile/frame
units are re-renderable: recovery = re-dispatch.  :func:`render_units`
drives a list of independent work units (tiles or frames) through a render
callable, detects failures (exceptions from the runtime — device resets,
preemptions — or a per-unit wall-clock timeout), retries with exponential
backoff, and reports per-unit status.  For multi-host runs each host
renders its own unit slice; a lost host's units are re-dispatched from its
survivors by the driver on the next call (the unit list is just data).

Fault injection for tests: pass ``inject_failure`` — a callable
``(unit_index, attempt) -> bool`` — to make chosen attempts raise.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional, Sequence


class UnitFailure(RuntimeError):
    pass


@dataclasses.dataclass
class UnitResult:
    index: int
    ok: bool
    attempts: int
    seconds: float
    result: object = None
    error: Optional[str] = None


def render_units(units: Sequence, render_one: Callable,
                 max_attempts: int = 3, timeout_s: Optional[float] = None,
                 backoff_s: float = 0.5,
                 on_progress: Optional[Callable[[UnitResult], None]] = None,
                 inject_failure: Optional[Callable[[int, int], bool]] = None,
                 ) -> List[UnitResult]:
    """Render every unit with detection + bounded re-dispatch.

    ``render_one(unit)`` must be a pure function of the unit (re-running it
    is safe by construction — the elastic recovery contract).  A unit whose
    attempt exceeds ``timeout_s`` wall-clock is treated as failed (the
    runtime call itself cannot be interrupted portably; the timeout marks
    the unit for the caller's attention and triggers a retry).
    """
    out: List[UnitResult] = []
    for i, unit in enumerate(units):
        t_unit = time.perf_counter()
        last_err = None
        ok = False
        result = None
        attempt = 0
        for attempt in range(1, max_attempts + 1):
            t0 = time.perf_counter()
            try:
                if inject_failure is not None and inject_failure(i, attempt):
                    raise UnitFailure(f"injected failure (unit {i}, "
                                      f"attempt {attempt})")
                result = render_one(unit)
                dt = time.perf_counter() - t0
                if timeout_s is not None and dt > timeout_s:
                    raise UnitFailure(
                        f"unit {i} exceeded {timeout_s:.1f}s ({dt:.1f}s)"
                    )
                ok = True
                break
            except Exception as e:  # noqa: BLE001 — runtime faults vary
                last_err = f"{type(e).__name__}: {e}"
                if attempt < max_attempts:
                    time.sleep(backoff_s * (2 ** (attempt - 1)))
        r = UnitResult(
            index=i, ok=ok, attempts=attempt,
            seconds=time.perf_counter() - t_unit,
            result=result, error=None if ok else last_err,
        )
        out.append(r)
        if on_progress is not None:
            on_progress(r)
    return out


def failed_units(results: Sequence[UnitResult]) -> List[int]:
    """Indices needing re-dispatch (feed back into render_units)."""
    return [r.index for r in results if not r.ok]
