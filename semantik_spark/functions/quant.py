"""Driver-side numeric quantization that matches the DUCKDB oracle.

Python's built-in round() is banker's rounding (half-to-EVEN); DuckDB's
round() is std::round — half-AWAY-from-zero evaluated on the double's
BINARY value. round_half_away below implements exactly that pairing,
which is the replay target: any driver-local algorithm whose quantized
state is replayed by a SQL oracle twin (IVF centroid refinement,
logistic regression weight updates) must quantize the way the oracle
does, or an exact half-point tie silently diverges the engines — the
same knife-edge class as the decimal-before-double rounding rule.

Scope caveat (do NOT assume Spark F.round agreement): Spark's F.round
on doubles applies BigDecimal HALF_UP to the DECIMAL REPRESENTATION,
which can differ from std::round on the binary value at literal
half-points — e.g. round_half_away(2.675, 2) == 2.67 (the double is
just below the half) while Spark F.round(lit(2.675), 2) == 2.68. The
two agree on values that are exact in binary (halves of dyadic
fractions) but this module's contract is DuckDB/std::round only; if a
driver-side value must instead match an F.round column, round it in
DECIMAL, not here.
"""

from __future__ import annotations

import math


def round_half_away(x: float, dp: int = 6) -> float:
    """round(x, dp) with half-AWAY-from-zero ties — the SQL semantics,
    not Python's half-even."""
    s = 10.0 ** dp
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s
