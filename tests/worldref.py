"""Independent pure-Python mirror of the synthetic world formulas.

Deliberately re-derived from the spec (not from world.py's SQL strings) so
tests catch "Spark and oracle share the same wrong fragment" failures.
Python ints are arbitrary-precision and floats are IEEE doubles, so results
are bit-identical to both engines.
"""

from __future__ import annotations

HALF_SQRT3 = 0.8660254037844386


def px(i: int) -> float:
    return ((i * 2654435761 + ((i * i) % 1000003) * 7919) % 1000000) / 1000.0


def py(i: int) -> float:
    return (((i + 7) * 1597334677 + (((i + 3) * (i + 3)) % 999983) * 104729) % 1000000) / 1000.0


def int_weight(value: float) -> int:
    import math

    return int(math.floor(abs(value) * 100.0))


def rect_params(custkey: int):
    return (
        px(custkey),
        py(custkey),
        float(5 + custkey % 11),
        float(5 + custkey % 7),
    )


def hex_params(suppkey: int):
    return (
        px(suppkey * 11 + 900007),
        py(suppkey * 13 + 110011),
        float(20 + (suppkey % 5) * 10),
    )


def part_point(partkey: int):
    return px(partkey * 3 + 500001), py(partkey * 5 + 700003)


def rect_contains(x, y, cx, cy, hw, hh) -> bool:
    return cx - hw <= x <= cx + hw and cy - hh <= y <= cy + hh


def hex_contains(x, y, cx, cy, r) -> bool:
    dx, dy = abs(x - cx), abs(y - cy)
    return (
        dx <= r
        and dy <= HALF_SQRT3 * r
        and HALF_SQRT3 * dx + 0.5 * dy <= HALF_SQRT3 * r
    )
