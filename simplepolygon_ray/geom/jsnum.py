"""ECMAScript Number-to-String formatting (Number::toString, radix 10).

The reference sorts its walk queue with a JS array comparison
(reference src/index.ts:326-328: ``coordA > coordB`` on ``[x, y]``
arrays), which coerces each coordinate pair to the string ``"x,y"``
using JS shortest-round-trip number formatting and compares
lexicographically.  Reproducing the golden fixtures therefore requires
reproducing that string form exactly.

Python's ``repr`` already produces the same shortest round-trip digit
sequence as JS (both use Grisu/Ryu-style shortest decimal); only the
surface formatting differs (JS prints ``5`` not ``5.0``, switches to
exponent form outside [1e-6, 1e21)).  This module re-applies the
ECMA-262 ยง6.1.6.1.20 layout rules on top of Python's digits.
"""

from __future__ import annotations

import math

__all__ = ["js_num_str", "js_coord_str"]


def js_num_str(x: float) -> str:
    """Format a float exactly as ECMAScript ``String(x)`` would."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0.0:
        return "0"  # JS String(-0) is "0"
    sign = "-" if x < 0 else ""
    s = repr(abs(float(x)))  # shortest round-trip digits
    if "e" in s:
        mant, _, ex = s.partition("e")
        exp = int(ex)
    else:
        mant, exp = s, 0
    if "." in mant:
        ip, fp = mant.split(".")
    else:
        ip, fp = mant, ""
    alldig = ip + fp
    lead = len(alldig) - len(alldig.lstrip("0"))
    d = alldig.lstrip("0").rstrip("0")
    if not d:
        return "0"
    # value == 0.d * 10**n  (n = decimal point position relative to d)
    n = len(ip) - lead + exp
    k = len(d)
    if k <= n <= 21:
        return sign + d + "0" * (n - k)
    if 0 < n <= 21:
        return sign + d[:n] + "." + d[n:]
    if -6 < n <= 0:
        return sign + "0." + "0" * (-n) + d
    # exponent form
    e = n - 1
    mant_s = d[0] + ("." + d[1:] if k > 1 else "")
    return sign + mant_s + "e" + ("+" if e >= 0 else "-") + str(abs(e))


def js_coord_str(coord) -> str:
    """JS String([x, y]) — the queue-sort key of reference src/index.ts:327."""
    return js_num_str(float(coord[0])) + "," + js_num_str(float(coord[1]))
