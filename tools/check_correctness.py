#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate.

Reads each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata parquet
tables, and compares: row count, schema (column names), and a hash of the
values with columns sorted by name (the driver's documented compare).

Dev tool only — the shipped Scala library has no python/duckdb dependency.
"""
import sys, json, hashlib, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    # DuckDB returns DECIMAL for decimal-literal arithmetic (e.g. ROUND of
    # a sum of 2.2-style literals) where Spark computes DOUBLE; the driver
    # gate equates them (dedup_linkage passed r10 with Decimal('3.9') vs
    # double 3.9), so coerce before the float path.
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # %.17g (full round-trip repr), not %.12g: the r10 ml_stump miss
        # proved 12 significant digits collapse distinct engine outputs
        # (…551.62 vs …551.63 both printed the same) while the driver
        # compares at full precision. Queries that want tolerance
        # already ROUND or floor-quantize explicitly on both sides.
        return f"{v:.17g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        eng = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        eng_cols = [d[0] for d in con.description]
        try:
            # DuckDB SUM(BIGINT) returns HUGEINT, which Arrow export turns
            # into double — the driver's compare then sees floats against
            # Spark's exact int64 and the hash diverges even though
            # fetchall() (python ints) would agree. Treat HUGEINT oracle
            # output as a failure so the oracle SQL gets an explicit CAST.
            rel = con.sql(sql)
            huge = [c for c, ty in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(ty)]
            if huge:
                print(f"FAIL {name}: oracle HUGEINT columns {huge} "
                      "(add CAST(... AS BIGINT))")
                n_fail += 1
                continue
            ora = con.execute(sql).fetchall()
            ora_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(eng_cols) != sorted(ora_cols):
            problems.append(f"schema {sorted(eng_cols)} vs {sorted(ora_cols)}")
        if len(eng) != len(ora):
            problems.append(f"rows {len(eng)} vs {len(ora)}")
        if not problems:
            he, ho = table_hash(eng_cols, eng), table_hash(ora_cols, ora)
            if he != ho:
                problems.append(f"hash {he} vs {ho}")
                order = sorted(range(len(eng_cols)), key=lambda i: eng_cols[i])
                es = sorted("|".join(norm_cell(r[i]) for i in order) for r in eng)
                oo = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i])
                os_ = sorted("|".join(norm_cell(r[i]) for i in oo) for r in ora)
                for i, (a, b) in enumerate(zip(es, os_)):
                    if a != b:
                        problems.append(f"first diff row {i}: engine={a!r} oracle={b!r}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(eng)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
