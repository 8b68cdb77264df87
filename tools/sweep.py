"""Driver-simulation correctness sweep: run EVERY queries() entry at a
given sf against its oracle_sql(), comparing rows + schema + values the way
the driver's gate does. Usage:
    python tools/sweep.py [sf_dir] [--cold] [--window N]
--cold wipes the /tmp corpus/stage/expected caches first, so corpus
generation, expected-table builds and stage materialization all run from
scratch (the driver's worst case). --window N sweeps only the FIRST N dict
entries — the driver's observed budget is 50, so `--window 50` previews
exactly the rows CORRECTNESS_r{N} will record."""
import glob
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
COLD = "--cold" in sys.argv
WINDOW = (int(sys.argv[sys.argv.index("--window") + 1])
          if "--window" in sys.argv else None)
TAG = SF.rstrip("/").split("/")[-1]

if COLD:
    for pat in (f"/tmp/ntr_corpus_{TAG}_*", f"/tmp/ntr_stage_{TAG}_*",
                f"/tmp/ntr_opexpected_{TAG}_*"):
        for p in glob.glob(pat):
            shutil.rmtree(p, ignore_errors=True)
    print(f"cold: wiped caches for {TAG}", flush=True)

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")


def to_pandas(result):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(round(float(x), 6)
                     if isinstance(x, (int, float, np.floating)) else x
                     for x in v)
    # NO bytes masking here: the driver's canonicalizer raw-sorts every
    # column and dies on bytearray cells (DuckDB BLOB -> bytearray). Round
    # 3's pre-hex in this sweep hid exactly that failure class
    # (media_frames/media_resize were 79/79 green locally yet red in
    # CORRECTNESS_r03). Python `bytes` on the Ray side ARE hashable, so a
    # silent pass-through would still under-detect — fail loudly instead:
    # query surfaces must never emit binary cells.
    if isinstance(v, (bytes, bytearray, memoryview)):
        raise TypeError("binary cell on a query surface — the driver's "
                        "canonicalizer cannot sort this; hex-encode it")
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(cell).astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


qs = entrymod.queries()
if WINDOW:
    qs = dict(list(qs.items())[:WINDOW])
sqls = entrymod.oracle_sql(SF)
results, t_all = {}, time.time()
for name, q in qs.items():
    t0 = time.time()
    try:
        ours = canon(to_pandas(q(SF)))
        theirs = canon(con.execute(sqls[name]).df())
        ok_schema = list(ours.columns) == list(theirs.columns)
        ok_rows = len(ours) == len(theirs)
        ok_vals = ok_schema and ok_rows
        if ok_vals:
            for c in ours.columns:
                a, b = ours[c], theirs[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    bo = a.isna() & b.isna()
                    if not (((a - b).abs() < 1e-6) | bo).all():
                        ok_vals = False
                        break
                elif not (a.astype(str).values == b.astype(str).values).all():
                    ok_vals = False
                    break
        results[name] = {"rows": ok_rows, "schema": ok_schema,
                         "values": ok_vals, "n": len(ours),
                         "sec": round(time.time() - t0, 1)}
    except Exception as exc:  # noqa: BLE001
        results[name] = {"rows": False, "schema": False, "values": False,
                         "err": f"{type(exc).__name__}: {exc}"[:200],
                         "sec": round(time.time() - t0, 1)}
    r = results[name]
    print(f"{'PASS' if r['values'] else 'FAIL'} {name} "
          f"({r.get('n', '?')} rows, {r['sec']}s)"
          + (f" {r.get('err', '')}" if not r["values"] else ""), flush=True)

n_pass = sum(1 for r in results.values() if r["values"])
print(f"\n{n_pass}/{len(results)} green in {round(time.time() - t_all)}s")
with open("/tmp/sweep_result.json", "w") as f:
    json.dump(results, f, indent=1)
ray.shutdown()
sys.exit(0 if n_pass == len(results) else 1)
