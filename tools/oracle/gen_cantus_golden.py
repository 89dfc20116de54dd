#!/usr/bin/env python3
"""Regenerate the Cantus CSV goldens from the EXECUTING reference.

Runs /root/reference/parse_cantus_csv.filename_to_text_func over the
committed fixture src/test/resources/cantus_like.csv and writes

  - src/test/resources/cantus_golden.json      (CantusCsvSpec differential)
  - src/test/resources/goldens/q_cantus_folio_text.parquet
        (DuckDB oracle for the q_cantus_folio_text CORRECTNESS row)

Run whenever the fixture changes:  python3 tools/oracle/gen_cantus_golden.py
"""
import csv
import json
import os
import sys

sys.path.insert(0, "/root/reference")
import parse_cantus_csv  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RES = os.path.join(REPO, "src", "test", "resources")
FIXTURE = os.path.join(RES, "cantus_like.csv")


def main():
    text_func = parse_cantus_csv.filename_to_text_func(FIXTURE)

    # folio list exactly as the reference builds it (distinct, melody-filtered,
    # header row skipped, sorted)
    with open(FIXTURE) as f:
        rows = list(csv.reader(f))[1:]
    rows = [x for x in rows if not x[10] == "*" and not x[2] == "folio"]
    folios = sorted(set(x[2] for x in rows))

    golden = {}
    for folio in folios:
        fname, text = text_func(folio)
        golden[folio] = {"fname": fname, "text": text}

    with open(os.path.join(RES, "cantus_golden.json"), "w") as f:
        json.dump(golden, f, indent=1)
        f.write("\n")

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(RES, "goldens"), exist_ok=True)
    table = pa.table(
        {
            "folio": pa.array(folios, pa.string()),
            "fname": pa.array([golden[f]["fname"] for f in folios], pa.string()),
            "text": pa.array([golden[f]["text"] for f in folios], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(RES, "goldens", "q_cantus_folio_text.parquet"))
    print(f"wrote goldens for {len(folios)} folios")


if __name__ == "__main__":
    main()
