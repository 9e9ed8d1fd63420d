"""Distance-unit conversion for every distance-parameter surface.

Reference parity: GT/enumeration/DistanceUnit.java:26-58 (Default, Meters,
Kilometers, Inches, Feet, Yards, Miles, NauticalMiles) and
GT/core/UnitConverter.java:46-80 (convertDistance), as honored in
GT/operations/NearOperation.java:96-117 — a search radius given in any
unit is converted to the layer CRS unit at PLAN time (one Python float
multiply; nothing per-row), and computed distances are converted back to
the requested unit in the output projection (NearOperation.java:145-155).

The engine's world coordinates are planar meters (the integer-millimeter
contract in world.py), so ``Default`` and ``Meters`` are both factor 1.
Factors are the exact international definitions the reference's
SI/USCustomary units resolve to (1 ft = 0.3048 m etc.) — public standard
values, not copied code.
"""

from __future__ import annotations

#: meters per one unit — DistanceUnit.java's enum, international values.
METERS_PER: dict[str, float] = {
    "Default": 1.0,
    "Meters": 1.0,
    "Kilometers": 1000.0,
    "Inches": 0.0254,
    "Feet": 0.3048,
    "Yards": 0.9144,
    "Miles": 1609.344,
    "NauticalMiles": 1852.0,
}


def factor(unit: str | None) -> float:
    """Meters per one ``unit``; None == Default == layer CRS unit."""
    if unit is None:
        return 1.0
    try:
        return METERS_PER[unit]
    except KeyError:
        raise ValueError(
            f"unknown DistanceUnit {unit!r}; one of {sorted(METERS_PER)}"
        ) from None


def to_world(value: float, unit: str | None) -> float:
    """A distance parameter given in ``unit`` -> world (CRS) units.

    UnitConverter.convertDistance(value, unit, crsUnit) with a metric CRS.
    """
    return float(value) * factor(unit)


def convert(value: float, from_unit: str | None, to_unit: str | None) -> float:
    """UnitConverter.convertDistance between two named units."""
    return float(value) * factor(from_unit) / factor(to_unit)
