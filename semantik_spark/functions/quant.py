"""Driver-side numeric quantization that matches SQL semantics.

Python's built-in round() is banker's rounding (half-to-EVEN), while
both engines' SQL round() is half-AWAY-from-zero (Spark's F.round on
doubles uses BigDecimal HALF_UP on the magnitude; DuckDB's round is
std::round). Any driver-local algorithm whose quantized state is
replayed by a SQL oracle twin (IVF centroid refinement, logistic
regression weight updates) must therefore quantize half-away too, or
an exact half-point tie silently diverges the engines — the same
knife-edge class as the decimal-before-double rounding rule.
"""

from __future__ import annotations

import math


def round_half_away(x: float, dp: int = 6) -> float:
    """round(x, dp) with half-AWAY-from-zero ties — the SQL semantics,
    not Python's half-even."""
    s = 10.0 ** dp
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s
