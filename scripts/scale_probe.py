#!/usr/bin/env python3
"""Builder-side generator for the scaling-probe corpus (sf0.1 -> "sf1"+).

Writes DST as perturbed replicas of the sf0.1 tables. Perturbations are
chosen so the DUPLICATE STRUCTURE scales linearly (10x docs -> 10x
planted near-dup pairs) rather than exploding combinatorially:

- documents: replica r suffixes every word with "_r" (r>0), so shingle
  sets are disjoint ACROSS replicas (no cross-replica Jaccard pairs) while
  each replica keeps the original within-replica dup structure. doc_id
  offset 10M per replica; n_chars recomputed.
- embeddings: replica r rotates the vector by r % dim positions
  (norm-preserving, decorrelating - exact replicas would add C(R,2)
  cos=1.0 pairs per vector and distort x14's output size superlinearly)
  and NEGATES it for r >= dim (rotation repeats with period dim=64, so
  at 100 replicas r and r-64 would otherwise be exact duplicates; the
  negated sibling has cosine -1, never a near-dup). vec_id offset 10M.

Relational families (FAMILIES rel|all), for the g/j/w/s/t/d/r/e and
trips (q/n/a) query families whose inputs are orders/lineitem/events:

- orders: o_orderkey offset 10M per replica (trips' trip_key/vid/garbage
  columns are pure functions of it, so the trips corpus scales with it);
  o_custkey UNCHANGED - per-customer order history grows R-fold, which
  scales the window-function partitions and join probe sides, the
  interesting stress.
- lineitem: l_orderkey gets the SAME offset, preserving the
  orders<->lineitem relationship per replica.
- events: event_id offset 10M; user_id offset 10M per replica so the
  e07 click-purchase SELF-join stays linear (unchanged user_ids would
  match replica i clicks to replica j purchases: R^2 output rows).
  Session/window state then grows with users, the realistic axis.
- dims (region nation customer supplier part): copied as-is - facts
  reference the same dim keys, so joins stay semantically intact while
  the big sides scale.

File layout (r20): the doc-family and dim COPYs set ROW_GROUP_SIZE so
the output carries MANY row groups per file. DuckDB's default (122880
rows/group) made documents/embeddings/part single-row-group files, and
Spark cannot split a parquet file below one row group - every
scan-rooted map stage (pii scrub, text quality, frame decode, the gram
dictionary build) then runs as ONE task regardless of cores. A real
warehouse table is never a single-row-group file; the small groups
emulate its multi-split layout at probe scale so scan parallelism is
measurable (spark guide section 6). Measured r20: the single-row-group
sf1 fixture read 8-core approximately equal to 32-core on exactly the scan-rooted queries.

This is builder tooling only (like check.py), not engine code.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# which table families to replicate: "doc" (documents+embeddings, the
# original probe corpus), "rel" (TPC-H facts + events + copied dims for
# the relational/window/event/trips query families), "zipf" (rel with a
# genuinely hot key: the plain replica sweep keeps per-customer history
# uniform at R orders each, so no partition is ever skewed relative to
# the others — "zipf" reroutes every 100th order to customer 0, giving
# one customer ~1% of ALL orders at any R. At 100x that is one 150k-row
# window partition / join group against a 100-row median, the shape
# AQE skew handling and the w01/w02 window sorts must survive), "all",
# or "full" (r20): "all" PLUS a replicated part table — the n11-n15
# gram/fuzzy family derives BOTH its axes (dictionary variants and
# probe strings) as pure functions of p_partkey, so a key-offset part
# replica sweep scales dictionary and probes together with DISJOINT
# token universes per replica (tokenSqlExpr maps distinct keys to
# distinct 12-letter tokens; no cross-replica near-dup pairs, the same
# linearity discipline as the doc/embedding replicas). lineitem's
# l_partkey stays in the replica-0 key range, so part-side join probes
# grow 10x while matches stay linear — the realistic big-dim shape.
FAMILIES = sys.argv[4] if len(sys.argv) > 4 else "doc"
assert FAMILIES in ("doc", "rel", "zipf", "all", "full"), \
    f"bad families arg {FAMILIES}"
# zipf hot-key rewrite for o_custkey (customer 0 = min c_custkey in the
# fixture); (o_orderkey + replica) % 100 spreads the stolen orders
# evenly across replicas and order positions
HOT_CUST = ("CASE WHEN (o_orderkey + r.range) % 100 = 0 THEN 0 "
            "ELSE o_custkey END" if FAMILIES == "zipf" else "o_custkey")
# rotate-and-negate decorrelation covers exactly 2*dim = 128 replicas:
# rotation repeats with period dim=64 and the sign flips once at r=64,
# so the first collision past the bound is replica r duplicating
# replica r-64 in the SAME negation half (replica 128 duplicates 64:
# rotation 0, both negated) — exact-duplicate embeddings (cos = 1.0) that
# superlinearly distort the quadratic shapes' output, the very artifact
# the negation exists to prevent. Fail loudly instead. The bound is an
# EMBEDDING fact, so it only gates runs that generate embeddings; a
# rel-only replication (key offsets, no vectors) is valid at any R.
assert REPLICAS <= 128 or FAMILIES in ("rel", "zipf"), (
    f"REPLICAS={REPLICAS} > 128 replays the rotation/negation period; "
    "add a second decorrelation term before sweeping beyond 128x")

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
written = []

# r20: the probe corpus must carry a WAREHOUSE-LIKE file layout for the
# tables whose single-file form packs into a handful of splits: Spark
# charges every file spark.sql.files.openCostInBytes (4 MB), so a 30 MB
# single file yields ~7 splits no matter the core count, and the
# per-doc CPU operators (pii scrub, text quality, lang id) then read
# 8-core == 32-core. 32 deterministic shard files (id % 32) make each
# file its own split - the multi-file layout any real big table has.
SHARDS = 32

def copy_sharded(select_sql, name, id_col, row_group=1024):
    """Write `select_sql` as DST/name.parquet/shard*.parquet, sharded
    deterministically by id, small row groups (see module doc)."""
    d = f"{DST}/{name}.parquet"
    os.makedirs(d, exist_ok=True)
    con.sql(f"CREATE OR REPLACE TEMP TABLE _shard_src AS {select_sql}")
    for i in range(SHARDS):
        con.sql(f"""
        COPY (SELECT * FROM _shard_src WHERE {id_col} % {SHARDS} = {i}
              ORDER BY {id_col})
        TO '{d}/shard{i:02d}.parquet'
          (FORMAT parquet, ROW_GROUP_SIZE {row_group})
        """)
    con.sql("DROP TABLE _shard_src")

if FAMILIES in ("doc", "all", "full"):
    # the rotation below hardcodes dim 64; on shorter vectors DuckDB's
    # list slicing CLAMPS out-of-range bounds, so rotations >= dim
    # silently return the unrotated vector — exact duplicates in the
    # same negation group, the artifact the scheme exists to prevent
    dim = con.sql(
        f"SELECT len(embedding) FROM "
        f"read_parquet('{SRC}/embeddings.parquet') LIMIT 1").fetchone()[0]
    assert dim == 64, f"rotation hardcodes dim 64, source has dim {dim}"
    copy_sharded(f"""
      WITH rep AS (
        SELECT d.doc_id + r.range * 10000000 AS doc_id,
          CASE WHEN r.range = 0 THEN d.text
               ELSE array_to_string(list_transform(string_split(d.text, ' '),
                      w -> w || '_' || r.range), ' ') END AS text,
          d.lang, d.source
        FROM read_parquet('{SRC}/documents.parquet') d, range({REPLICAS}) r
      )
      SELECT doc_id, text, lang, source,
        CAST(length(text) AS BIGINT) AS n_chars
      FROM rep""", "documents", "doc_id")

    copy_sharded(f"""
      SELECT e.vec_id + r.range * 10000000 AS vec_id,
        CAST(list_transform(
          list_concat(e.embedding[(r.range % 64) + 1:],
                      e.embedding[1:(r.range % 64)]),
          x -> CASE WHEN r.range >= 64 THEN -x ELSE x END)
             AS FLOAT[]) AS embedding,
        e.label
      FROM read_parquet('{SRC}/embeddings.parquet') e, range({REPLICAS}) r""",
      "embeddings", "vec_id", row_group=512)
    written += ["documents", "embeddings"]

if FAMILIES in ("rel", "zipf", "all", "full"):
    con.sql(f"""
    COPY (
      SELECT o_orderkey + r.range * 10000000 AS o_orderkey,
        {HOT_CUST} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'), range({REPLICAS}) r
      ORDER BY o_orderkey
    ) TO '{DST}/orders.parquet' (FORMAT parquet)
    """)
    con.sql(f"""
    COPY (
      SELECT l_orderkey + r.range * 10000000 AS l_orderkey,
        l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{SRC}/lineitem.parquet'), range({REPLICAS}) r
      ORDER BY l_orderkey
    ) TO '{DST}/lineitem.parquet' (FORMAT parquet)
    """)
    con.sql(f"""
    COPY (
      SELECT event_id + r.range * 10000000 AS event_id, ts,
        user_id + r.range * 10000000 AS user_id, event_type, value, props
      FROM read_parquet('{SRC}/events.parquet'), range({REPLICAS}) r
      ORDER BY event_id
    ) TO '{DST}/events.parquet' (FORMAT parquet)
    """)
    for dim in ("region", "nation", "customer", "supplier"):
        con.sql(f"""
        COPY (SELECT * FROM read_parquet('{SRC}/{dim}.parquet'))
        TO '{DST}/{dim}.parquet' (FORMAT parquet, ROW_GROUP_SIZE 1024)
        """)
    if FAMILIES != "full":
        # sharded like the doc family: the gram/fuzzy dictionary build
        # (gramScaleDim etc.) is a scan-rooted map over part
        copy_sharded(
            f"SELECT * FROM read_parquet('{SRC}/part.parquet')",
            "part", "p_partkey")
    written += ["orders", "lineitem", "events"]

if FAMILIES == "full":
    # part replicas with offset keys: the n11-n15 dictionary variants
    # and probe strings are pure functions of p_partkey (token and
    # probe-edit templates), so this scales both gram-family axes R-fold
    # with replica-disjoint token universes. p_name/p_brand etc. are
    # kept verbatim — n11's probes append the (offset) key to the name,
    # so its probe set also stays replica-distinct.
    copy_sharded(f"""
      SELECT p_partkey + r.range * 10000000 AS p_partkey,
        p_name, p_brand, p_type, p_size, p_retailprice
      FROM read_parquet('{SRC}/part.parquet'), range({REPLICAS}) r""",
      "part", "p_partkey")
    written += ["part"]

for t in written:
    path = f"{DST}/{t}.parquet"
    glob = f"{path}/*.parquet" if os.path.isdir(path) else path
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{glob}')").fetchone()[0]
    print(f"{t}: {n} rows")
