"""Walmart-shaped CSV fixtures per FIXTURES.md: train/features/stores with
the reference's data quirks — "NA" markdown literals, TRUE/FALSE booleans,
a duplicate-row variant, and a CR-only-line-ending stores variant."""

from __future__ import annotations

import random
from datetime import date, timedelta
from pathlib import Path

N_STORES = 45
DEPTS = list(range(1, 30))
START = date(2010, 2, 5)
N_WEEKS = 40


def _dates():
    return [START + timedelta(weeks=w) for w in range(N_WEEKS)]


def generate(root: Path) -> dict[str, Path]:
    rng = random.Random(42)
    dates = _dates()
    holiday_dates = set(rng.sample(dates, 3))

    train = root / "train.csv"
    with train.open("w") as fh:
        fh.write("Store,Dept,Date,Weekly_Sales,IsHoliday\n")
        for s in range(1, N_STORES + 1):
            for d in DEPTS:
                if rng.random() < 0.3:  # sparse depts per store
                    continue
                for dt in dates:
                    sales = round(rng.lognormvariate(9, 1), 2)
                    if rng.random() < 0.01:
                        sales = -sales  # returns exist in real data
                    hol = "TRUE" if dt in holiday_dates else "FALSE"
                    fh.write(f"{s},{d},{dt.isoformat()},{sales},{hol}\n")

    features = root / "features.csv"
    with features.open("w") as fh:
        fh.write(
            "Store,Date,Temperature,Fuel_Price,MarkDown1,MarkDown2,"
            "MarkDown3,MarkDown4,MarkDown5,CPI,Unemployment,IsHoliday\n"
        )
        for s in range(1, N_STORES + 1):
            for dt in dates:
                def md(p):
                    return (
                        "NA" if rng.random() < p else str(round(rng.uniform(0, 5000), 2))
                    )
                hol = "TRUE" if dt in holiday_dates else "FALSE"
                fh.write(
                    f"{s},{dt.isoformat()},{round(rng.uniform(-10, 100), 2)},"
                    f"{round(rng.uniform(2.4, 4.5), 3)},{md(0.3)},{md(0.7)},"
                    f"{md(0.3)},{md(0.3)},{md(0.3)},{round(rng.uniform(126, 228), 4)},"
                    f"{round(rng.uniform(3.8, 14.3), 3)},{hol}\n"
                )

    stores = root / "stores.csv"
    lines = ["Store,Type,Size"]
    for s in range(1, N_STORES + 1):
        typ = "ABC"[s % 3]
        lines.append(f"{s},{typ},{rng.randint(34000, 220000)}")
    stores.write_text("\n".join(lines) + "\n")

    # CR-only variant (the checked-in reference stores.csv quirk)
    stores_cr = root / "stores_cr.csv"
    stores_cr.write_bytes(("\r".join(lines) + "\r").encode())

    # duplicate-row variant of train (exercises dedup)
    train_dup = root / "train_dup.csv"
    content = train.read_text().splitlines()
    dup_rows = content[1:6]
    train_dup.write_text("\n".join(content + dup_rows) + "\n")

    return {
        "train": train,
        "features": features,
        "stores": stores,
        "stores_cr": stores_cr,
        "train_dup": train_dup,
        "root": root,
    }
