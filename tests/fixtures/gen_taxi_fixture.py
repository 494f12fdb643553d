"""One-shot deterministic generator for taxi_events.csv.

Emits a reference-shaped NYC taxi feed (a7/RegionEventCount.scala:
comma CSV, no header, color at ordinal 0, dropoff coordinates at
10/11 for yellow and 8/9 for green) with a seeded PRNG so the
committed fixture is reproducible byte-for-byte. A fixed fraction of
dropoffs land inside the goldman / citigroup bounding boxes so the
geo classification has non-trivial counts in every hourly window.

Run from the repo root: python tests/fixtures/gen_taxi_fixture.py
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from pathlib import Path

GOLDMAN = (-74.0144185, -74.013777, 40.7138745, 40.7152275)
CITIGROUP = (-74.012083, -74.009867, 40.720053, 40.7217236)
N_ROWS = 4000
N_COLS = 20
START = datetime(2019, 1, 1, 0, 0, 0)
HOURS = 24


def _point(rng: random.Random, bbox: tuple[float, float, float, float]):
    lon_min, lon_max, lat_min, lat_max = bbox
    # Strictly inside (the reference predicate is exclusive).
    return (
        rng.uniform(lon_min + 1e-6, lon_max - 1e-6),
        rng.uniform(lat_min + 1e-6, lat_max - 1e-6),
    )


def main() -> None:
    rng = random.Random(451)
    out = Path(__file__).parent / "taxi_events.csv"
    lines = []
    for i in range(N_ROWS):
        color = "yellow" if rng.random() < 0.6 else "green"
        pickup = START + timedelta(seconds=rng.randrange(HOURS * 3600))
        dropoff = pickup + timedelta(seconds=rng.randrange(300, 1800))
        r = rng.random()
        if r < 0.15:
            lon, lat = _point(rng, GOLDMAN)
        elif r < 0.27:
            lon, lat = _point(rng, CITIGROUP)
        else:  # scatter over lower Manhattan, outside both boxes
            lon = rng.uniform(-74.03, -73.97)
            lat = rng.uniform(40.70, 40.76)
            while (
                GOLDMAN[0] < lon < GOLDMAN[1] and GOLDMAN[2] < lat < GOLDMAN[3]
            ) or (
                CITIGROUP[0] < lon < CITIGROUP[1]
                and CITIGROUP[2] < lat < CITIGROUP[3]
            ):
                lon = rng.uniform(-74.03, -73.97)
                lat = rng.uniform(40.70, 40.76)
        cols = [""] * N_COLS
        cols[0] = color
        cols[1] = str(1 + rng.randrange(3))  # vendor id junk
        cols[2] = pickup.strftime("%Y-%m-%d %H:%M:%S")
        cols[3] = dropoff.strftime("%Y-%m-%d %H:%M:%S")
        cols[4] = str(1 + rng.randrange(4))  # passenger count junk
        cols[5] = f"{rng.uniform(0.3, 12.0):.2f}"  # trip distance junk
        if color == "yellow":
            # pickup coords at 6/7 (junk), dropoff at 10/11
            cols[6] = f"{rng.uniform(-74.03, -73.97):.6f}"
            cols[7] = f"{rng.uniform(40.70, 40.76):.6f}"
            cols[8] = "1"
            cols[9] = "N"
            cols[10] = f"{lon:.7f}"
            cols[11] = f"{lat:.7f}"
        else:
            # green schema: dropoff at 8/9
            cols[6] = f"{rng.uniform(-74.03, -73.97):.6f}"
            cols[7] = f"{rng.uniform(40.70, 40.76):.6f}"
            cols[8] = f"{lon:.7f}"
            cols[9] = f"{lat:.7f}"
            cols[10] = "1"
            cols[11] = "N"
        for j in range(12, N_COLS):
            cols[j] = f"{rng.uniform(0, 50):.2f}"
        lines.append(",".join(cols))
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(lines)} rows)")


if __name__ == "__main__":
    main()
