"""Rule configuration for the fraud-detection pipeline.

Reference parity: constants in
/root/reference/flink/fraud_detection.py:20-24 (MAX_AMOUNT=200,
RAPID_WINDOW_MS=10_000, RAPID_TX_COUNT=3, IMPOSSIBLE_TRAVEL_MS=120_000)
and scoring weights at fraud_detection.py:87-122 (+40 high amount,
+30 rapid, +50 impossible travel; FRAUD at >=40, HIGH severity at
>=70). All thresholds are configurable here; the reference values are
the defaults. ``for_events_table`` scales the time windows to the
synthetic `events` table's cadence (~26 min median per-user gap) so
rules actually fire there.
"""

from __future__ import annotations

from dataclasses import dataclass

EARTH_RADIUS_KM = 6371.0

# Reference fraud_detection.py:26-32
LOCATION_COORDS: dict[str, tuple[float, float]] = {
    "NY": (40.7128, -74.0060),
    "CA": (34.0522, -118.2437),
    "TX": (29.7604, -95.3698),
    "FL": (25.7617, -80.1918),
    "IL": (41.8781, -87.6298),
}
LOCATIONS: list[str] = list(LOCATION_COORDS)


@dataclass(frozen=True)
class RuleConfig:
    max_amount: float = 200.0
    rapid_window_ms: int = 10_000
    rapid_tx_count: int = 3
    impossible_travel_ms: int = 120_000
    travel_min_km: float = 500.0
    score_high_amount: int = 40
    score_rapid: int = 30
    score_travel: int = 50
    fraud_threshold: int = 40
    high_severity_threshold: int = 70
    state_ttl_ms: int = 600_000  # StateTtlConfig Time.minutes(10)

    @classmethod
    def for_events_table(cls) -> "RuleConfig":
        """Windows scaled for the synthetic `events` table cadence."""
        return cls(rapid_window_ms=6 * 3600 * 1000,
                   impossible_travel_ms=2 * 3600 * 1000)
