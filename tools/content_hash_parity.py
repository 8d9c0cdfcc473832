"""Pin the in-engine content fingerprint's VERDICT to the driver's hash
(r8 verdict directive #4 "done" criterion).

For every registry entry with an oracle, at sf0.01, this computes BOTH
adjudications:
  - driver method: collect both results, frame_fingerprint (sorted
    stringified rows, sha256) — the exact code the gate runs;
  - in-engine method: content_fingerprint(df) on Spark vs
    content_fingerprint_sql over the oracle text (types via DESCRIBE).

An entry passes when the two methods return the SAME verdict (both
match — all gate entries are green — and, for the synthetic
perturbation check in tests/test_round9_ops.py, both mismatch). Entries
whose output carries a column type without an engine-portable canonical
form are recorded ``unsupported`` (they keep driver-hash adjudication;
the count-parity fallback names them loudly).

    python tools/content_hash_parity.py                 # whole registry
    python tools/content_hash_parity.py name1 name2 ...

Writes CONTENT_HASH_PARITY.json next to the repo artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from nzwirelessmap_fetch_spark.catalog import TABLES
from nzwirelessmap_fetch_spark.functions.content_hash import (
    ContentHashUnsupported,
    content_fingerprint,
    content_fingerprint_sql,
)
from nzwirelessmap_fetch_spark.session import get_spark
from tests.oracle import frame_fingerprint

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")


def main(names: list[str]) -> int:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if not names:
        names = [n for n in qs if n in oracles]

    spark = get_spark(
        "content-hash-parity", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")

    out: dict[str, dict] = {}
    disagreements = 0
    for name in names:
        if name not in oracles:
            continue
        t0 = time.monotonic()
        row: dict = {}
        try:
            sdf = qs[name](spark, SF_DIR)
            # driver method
            ln, lc, lh = frame_fingerprint(sdf.toPandas())
            rn, rc, rh = frame_fingerprint(con.execute(oracles[name]).df())
            driver_verdict = (ln == rn) and (lc == rc) and (lh == rh)
            # in-engine method
            try:
                sfp = content_fingerprint(sdf).collect()[0]
                desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
                ofp = con.execute(
                    content_fingerprint_sql(
                        oracles[name], [(d[0], d[1]) for d in desc]
                    )
                ).fetchone()
            except ContentHashUnsupported as ue:
                row = {
                    "unsupported": str(ue)[:120],
                    "driver_match": driver_verdict,
                    "sec": round(time.monotonic() - t0, 2),
                }
                out[name] = row
                print(f"{name}: {json.dumps(row)}", flush=True)
                continue
            engine_verdict = (
                int(sfp["n_rows"]) == int(ofp[0])
                and str(sfp["hash_sum"]) == str(ofp[1])
                and int(sfp["hash_xor"]) == int(ofp[2])
                and sorted(sdf.columns) == sorted(d[0] for d in desc)
            )
            row = {
                "driver_match": driver_verdict,
                "engine_match": engine_verdict,
                "agree": driver_verdict == engine_verdict,
                "sec": round(time.monotonic() - t0, 2),
            }
            if not row["agree"]:
                disagreements += 1
        except Exception as e:  # noqa: BLE001
            row = {"err": f"{type(e).__name__}: {e}"[:300]}
            disagreements += 1
        out[name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    n_unsup = sum(1 for r in out.values() if r.get("unsupported"))
    print(
        f"\n{len(out)} compared, {disagreements} verdict disagreements, "
        f"{n_unsup} unsupported (driver-hash only)"
    )
    dest = os.environ.get(
        "SPARK_GRAFT_PARITY_OUT",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "CONTENT_HASH_PARITY.json"),
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dest}")
    spark.stop()
    return 1 if disagreements else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
