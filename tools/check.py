#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query dir under outDir: read our parquet, run the matching
oracle_sql.json entry in DuckDB over the sfDir tables, sort columns by
name, and compare values row-by-row. Reports schema/dtype drift too,
since the driver's hash compare is assumed strict.
"""
import json
import os
import sys

import duckdb
import pandas as pd


def main(out_dir: str, sf_dir: str) -> int:
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(got)} rows)")
            if len(got) == 0:
                print(f"    !! EMPTY RESULT")
                failures += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  X {name}: oracle SQL failed: {e}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"  X {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"  X {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                if str(g.dtype) != str(e.dtype):
                    print(f"    ~ {name}.{c}: dtype {g.dtype} vs {e.dtype}")
                try:
                    geq = g.reset_index(drop=True)
                    eeq = e.reset_index(drop=True)
                    neq = ~((geq == eeq) | (geq.isna() & eeq.isna()))
                    if neq.any():
                        i = int(neq.idxmax())
                        print(f"  X {name}.{c}: first diff at row {i}: "
                              f"{geq[i]!r} != {eeq[i]!r}")
                        ok = False
                except Exception as ex:
                    print(f"  X {name}.{c}: compare error {ex}")
                    ok = False
        if ok:
            print(f"  OK {name} ({len(got)} rows)")
        else:
            failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
