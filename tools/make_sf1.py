#!/usr/bin/env python3
"""Synthesize an sf1 bench dataset by replicating sf0.1 10x with key
offsets (tooling only — the engine never reads this in the gate).

Fact tables and their foreign keys are offset per replica so join
cardinalities scale linearly (each replica is a self-consistent copy of
the star); dimension tables with fixed real-world cardinality (region,
nation) stay as-is, like TPC-H. Embedding vectors and document texts
repeat verbatim — fine for PERFORMANCE validation (plan shapes, shuffle
sizes), which is all sf1 is for; correctness stays gated at sf0.01.
"""
import duckdb, os, sys

SRC = '/root/testdata/sf0.1'
DST = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf1'
R = 10

# per-replica id offsets, comfortably above sf0.1 max keys
KO = 10_000_000   # orderkey
KC = 1_000_000    # custkey
KP = 1_000_000    # partkey
KS = 100_000      # suppkey
KE = 10_000_000   # event_id
KU = 1_000_000    # user_id
KD = 1_000_000    # doc_id
KV = 1_000_000    # vec_id

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

def gen(name, select_tpl):
    out = f'{DST}/{name}.parquet'
    if os.path.exists(out):
        print(f'{name}: exists, skipping'); return
    selects = ' UNION ALL '.join(select_tpl.format(r=r) for r in range(R))
    con.execute(f"COPY ({selects}) TO '{out}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f'{name}: {n}')

T = lambda t: f"'{SRC}/{t}.parquet'"

gen('lineitem', f"""
  SELECT l_orderkey + {{r}}*{KO} AS l_orderkey,
         l_partkey + {{r}}*{KP} AS l_partkey,
         l_suppkey + {{r}}*{KS} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {T('lineitem')}""")
gen('orders', f"""
  SELECT o_orderkey + {{r}}*{KO} AS o_orderkey,
         o_custkey + {{r}}*{KC} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {T('orders')}""")
gen('customer', f"""
  SELECT c_custkey + {{r}}*{KC} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {T('customer')}""")
gen('part', f"""
  SELECT p_partkey + {{r}}*{KP} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {T('part')}""")
gen('supplier', f"""
  SELECT s_suppkey + {{r}}*{KS} AS s_suppkey, s_name, s_nationkey,
         s_acctbal
  FROM {T('supplier')}""")
gen('events', f"""
  SELECT event_id + {{r}}*{KE} AS event_id, ts,
         user_id + {{r}}*{KU} AS user_id, event_type, value, props
  FROM {T('events')}""")
gen('documents', f"""
  SELECT doc_id + {{r}}*{KD} AS doc_id, text, lang, source, n_chars
  FROM {T('documents')}""")
gen('embeddings', f"""
  SELECT vec_id + {{r}}*{KV} AS vec_id, embedding, label
  FROM {T('embeddings')}""")

for dim in ('region', 'nation'):
    out = f'{DST}/{dim}.parquet'
    if not os.path.exists(out):
        con.execute(f"COPY (SELECT * FROM {T(dim)}) TO '{out}' (FORMAT PARQUET)")
        print(f'{dim}: copied')
print('done:', DST)
