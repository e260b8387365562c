#!/usr/bin/env python3
"""Adversarial-corpus oracle sweep (dev tool, driver-side python only).

The t2 gate exercises the oracles on the driver's well-behaved synthetic
corpus; cross-engine divergence is usually DATA-dependent (null text,
null lang/source, unicode, empty tokens from doubled spaces, degenerate
one-token docs, 10k-token outliers). This script regenerates a hostile
documents table under /tmp/adv_corpus (other tables copied from
sf0.001), then the usual Verify + check.py pair compares Spark against
DuckDB on it for every documents-backed query.

Five corpora: /tmp/adv_corpus (hostile documents), /tmp/adv_events
(hostile events — timestamp ties, single-sided view/purchase cohorts,
midnight boundaries, extreme values, null/empty/malformed props),
/tmp/adv_emb (hostile embeddings), /tmp/adv_rel (hostile TPC-H-shape
relational tables), and /tmp/adv_html (round 9: crafted markup-shaped
texts + URL-hostile sources + BOM/astral charset edges for the
WebIngest family).

Usage:
  python3 scripts/adv_sweep.py                     # build both corpora
  sbt "runMain graft.Verify /tmp/adv_corpus /tmp/vadv <names>"
  python3 scripts/check.py /tmp/adv_corpus /tmp/vadv
  # …and the same pair against /tmp/adv_events for events-backed queries

Round-7 results: 19/19 documents-backed queries PASS; the events sweep
caught (and the fixes now pin) an ANSI-mode cast abort in json_extract
on non-integer JSON values and oracle-side json_extract_string errors
on malformed/empty props in json_extract/variant_stats — after the
TRY_CAST hardening, 20/20 events-backed queries PASS.

Round-7 fourth session: the FULL registry (181 queries) now runs against
all three hostile corpora, which surfaced and fixed:
 - contentHash/doc_fingerprint NULL-text divergence (Spark NULL vs
   DuckDB list_prepend-[0] → 0); both sides now coalesce(text, '').
 - tokenCumsum's offsets equi-join dropped NULL-lang rows the oracle's
   window PARTITION BY kept (shard_packing/pack_sequences).
 - polyHash/polyHash2/cdcBounds folded UTF-8 BYTES / UTF-16 units while
   the oracles fold CODEPOINTS — divergent on any non-ASCII char
   (café/emoji); all kernels now iterate codepoints.
 - a DuckDB 1.0 list_reduce bug: a CASE branching on the ACCUMULATOR
   inside the lambda miscomputes when many varying-length lists share a
   chunk (span_corruption); the oracle fold is now branch-free
   boolean-arithmetic.
 - pack_sequences' all-null offset groups ('' in concat_ws vs NULL in
   string_agg), global_row_number's un-CAST TIMESTAMPTZ output, and
   approx_quantiles' value-window claim, which the sketch guarantee
   does not imply on sparse tails (now the true rank-window check).
After the fixes: 181/181 PASS on /tmp/adv_corpus, /tmp/adv_events and
/tmp/adv_emb, and 181/181 on the driver corpus at all three sfs.

Same session, fourth corpus: /tmp/adv_rel — hostile TPC-H-shape tables
(null keys and null foreign keys, referential breaks both directions,
duplicate (orderkey, linenumber) lines, 100% discounts, negative
prices, epoch/midnight/tie timestamps, a 3000-line hot order). First
drive: 179/181 — corr_stats/regr_stats ANSI-aborted (DIVIDE_BY_ZERO)
on zero-variance groups; both now route the divisions through lazy
CASE branches (NULL correlation/slope on degenerate groups, variance
clamped at 0 before sqrt so fp cancellation cannot NaN), mirrored in
the oracles. After: 181/181 PASS. Joins, rollups, windows, medians,
salted_join, and fuzzy_join survived the corpus unchanged.
"""
import random
import shutil
import subprocess
import sys

import duckdb

DIR = "/tmp/adv_corpus"
EDIR = "/tmp/adv_events"


def build_events():
    subprocess.run(["mkdir", "-p", EDIR], check=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{EDIR}/{t}.parquet")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("""CREATE TABLE e (event_id BIGINT, ts TIMESTAMPTZ,
      user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)""")
    rows, eid = [], 0

    def add(ts, user, typ, val, props):
        nonlocal eid
        rows.append((eid, ts, user, typ, val, props))
        eid += 1

    # user 1: ten events at the SAME instant (tiebreak stress)
    for i in range(10):
        add("2024-01-01 12:00:00+00", 1,
            ["view", "click", "purchase", "view", "scroll"][i % 5],
            float(i), '{"k":%d}' % i)
    # user 2: purchases only (null backward/forward as-of paths)
    for i in range(6):
        add(f"2024-01-02 0{i}:30:00+00", 2, "purchase", 10.0 * i, None)
    # user 3: views only
    for i in range(6):
        add(f"2024-01-03 0{i}:15:00+00", 3, "view", -10.0 * i, "")
    # user 4: extreme values, midnight boundaries, malformed props
    add("2024-01-04 00:00:00+00", 4, "view", 0.0, '{bad')
    add("2024-01-04 00:00:00+00", 4, "purchase", 1e9, '{"k":null}')
    add("2024-01-05 00:00:00+00", 4, "view", -1e9, None)
    add("2024-01-05 23:59:59.999999+00", 4, "purchase", 1e-9, '{"k":"v"}')
    # nulls in every nullable slot: user, type, value, and even ts —
    # batch windows group a NULL ts identically in both engines, and the
    # streaming ops filter it before stateful operators
    add("2024-01-06 10:00:00+00", None, "view", 1.0, None)
    add("2024-01-06 10:01:00+00", 6, None, 2.0, None)
    add("2024-01-06 10:02:00+00", 6, "view", None, None)
    add(None, 6, "view", 3.0, None)
    # user 5: a normal week of alternating activity
    random.seed(3)
    for d in range(1, 8):
        for i in range(4):
            add(f"2024-01-0{d} {10 + i}:0{i}:0{i}+00", 5,
                random.choice(["view", "purchase", "click"]),
                random.uniform(-50, 50), '{"k":1}')
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY e TO '{EDIR}/events.parquet' (FORMAT PARQUET)")
    print(f"built {EDIR}/events.parquet with "
          f"{con.sql('SELECT count(*) FROM e').fetchone()[0]} hostile events")


MDIR = "/tmp/adv_emb"


def build_embeddings():
    subprocess.run(["mkdir", "-p", MDIR], check=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{MDIR}/{t}.parquet")
    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    rows = [
        (0, [0.0] * 64, 0),                              # ZERO query vector
        (1, [1.0] * 64, 1),                              # all-positive
        (2, [-1.0] * 64, 2),                             # all-negative
        (3, [1e-40] * 64, 3),                            # denormal floats
        (4, [(-1.0) ** i for i in range(64)], 4),        # alternating signs
        (5, [1.0] * 64, 1),                              # duplicate of 1
        (6, [0.0] * 64, None),                           # zero + NULL label
        (62, [1e38] * 64, 6),                            # norm overflows to +Inf
        (63, [float("inf"), 1.0] + [0.0] * 62, 7),       # an Inf coordinate
    ]
    random.seed(11)
    for i in range(7, 60):
        rows.append((i, [random.uniform(-1, 1) for _ in range(64)],
                     random.choice(range(8))))
    con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
    # NULL-element and genuine-NaN vectors via SQL — the Python client
    # converts float('nan') list elements to NULL on ingest, which is a
    # DIFFERENT hostile class (malformed vector) than an IEEE NaN
    con.execute("INSERT INTO e SELECT 61, list_transform(range(64), "
                "i -> 'nan'::FLOAT), 5")                 # true NaN vector
    con.execute("INSERT INTO e SELECT 64, list_transform(range(64), "
                "i -> NULL::FLOAT), 5")                  # all-NULL elements
    con.execute("INSERT INTO e SELECT 65, list_transform(range(64), "
                "i -> CASE WHEN i = 3 THEN NULL ELSE 0.5 END::FLOAT), 6")
    # ^ ONE null slot: the partial-null vector Spark's ArrayData would
    #   silently read as 0.0 without the kernels' isNullAt probe
    # wrong-width vectors: Spark kernels min-length truncate, DuckDB
    # folds the missing slots to NULL — the dims gate must drop both;
    # the 96-dim one would also trip sign_pack's fail-loudly width check
    con.execute("INSERT INTO e SELECT 66, list_transform(range(32), "
                "i -> 0.25::FLOAT), 2")                  # 32-dim vector
    con.execute("INSERT INTO e SELECT 67, list_transform(range(96), "
                "i -> 0.25::FLOAT), 3")                  # 96-dim vector
    con.execute(f"COPY e TO '{MDIR}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"built {MDIR}/embeddings.parquet with "
          f"{con.sql('SELECT count(*) FROM e').fetchone()[0]} hostile vectors")


def main():
    build_events()
    build_embeddings()
    subprocess.run(["mkdir", "-p", DIR], check=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{DIR}/{t}.parquet")
    con = duckdb.connect()
    rows = [
        (0, None, "en", "web", 0),                        # null text
        (1, "", "en", "web", 0),                          # empty text
        (2, "x", "en", "web", 1),                         # single token
        (3, "  double  spaces  here  ", "en", "web", 24), # empty tokens
        (4, "的 了 是 在 的 了 是 在 hello the a of and", "zh", "cjk", 30),
        (5, "café naïve emoji 😀 mixed ascii the a of and more words here to pass",
         "fr", "uni", 60),
    ]
    run = " ".join(f"w{i}" for i in range(1, 12))         # shared 11-token run
    rows += [
        (6, run + " tail_a " + "filler " * 5, "en", "web", 80),
        (7, "head_b " + run + " other tail", "en", "mirror", 80),
        (8, "identical doc body with the a of and tokens repeated the a of and",
         "en", "web", 60),
        (9, "identical doc body with the a of and tokens repeated the a of and",
         "en", "mirror", 60),
    ]
    rows += [
        (60, "tab\there newline\nline cr\rdone the a of and pad pad", "en",
         "web", 50),                                      # control chars
        (61, "     ", "en", "web", 5),                    # spaces only
        (62, "pre\x01post the a of and sentinel test", "en", "web",
         40),                                             # BPE sentinel char
        (63, "cafe\u0301 nfd combining the a of and words", "fr", "uni",
         40),                                             # NFD combining mark
        (64, "\u0645\u0631\u062d\u0628\u0627 rtl text the a of and",
         "ar", "uni", 30),                                # RTL codepoints
        (65, "x" * 50000 + " the a of and", "en", "big", 50014),  # huge token
    ]
    big = " ".join(f"t{i % 97}" for i in range(10000))    # 10k-token outlier
    rows += [
        (10, big, "en", "big", len(big)),
        (11, "el la de los words espanol the mixed", "es", "web", 40),
        (12, None, None, None, None),                     # all-null row
        (13, "der die das und german text here with enough words to matter ok",
         "de", "web", 60),
    ]
    random.seed(7)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "a", "of", "and",
             "el", "der", "le", "123", "x9"]
    for i in range(14, 60):
        t = " ".join(random.choice(vocab)
                     for _ in range(random.randint(1, 120)))
        rows.append((i, t, random.choice(["en", "es", "de", "fr", "zh"]),
                     random.choice(["web", "cjk", "uni", "big", "mirror"]),
                     len(t)))
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{DIR}/documents.parquet' (FORMAT PARQUET)")
    print(f"built {DIR}/documents.parquet with "
          f"{con.sql('SELECT count(*) FROM d').fetchone()[0]} hostile docs")


RDIR = "/tmp/adv_rel"


def build_relational():
    """Hostile TPC-H-shape star schema: null keys, referential breaks,
    duplicate keys, extreme/negative money, midnight/tie timestamps, a
    hot skew key — the join/rollup/percentile divergence surface the
    well-behaved driver tables never exercise."""
    subprocess.run(["mkdir", "-p", RDIR], check=True)
    for t in ["region", "nation", "events", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{RDIR}/{t}.parquet")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")

    con.execute("""CREATE TABLE c (c_custkey BIGINT, c_name VARCHAR,
      c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)""")
    cust = [
        (1, "Customer#1", 0, 100.5, "BUILDING"),
        (2, "Customer#2", 1, -999999999.99, "AUTOMOBILE"),   # extreme debt
        (3, None, 2, 0.0, "BUILDING"),                       # null name
        (4, "Customer#4", None, 50.0, None),                 # null fk + segment
        (5, "Customer#5", 3, None, "MACHINERY"),             # null balance
        (6, "Customer#1", 4, 100.5, "BUILDING"),             # duplicate name
        (7, "Customer#7", 0, 999999999.99, "HOUSEHOLD"),     # no orders
    ]
    con.executemany("INSERT INTO c VALUES (?,?,?,?,?)", cust)
    con.execute(f"COPY c TO '{RDIR}/customer.parquet' (FORMAT PARQUET)")

    con.execute("""CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT,
      o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP,
      o_orderpriority VARCHAR)""")
    mid = "2024-06-01 00:00:00"                              # midnight tie
    orders = [
        (100, 1, "O", 1000.0, mid, "1-URGENT"),
        (101, 1, "F", 2000.0, mid, "2-HIGH"),                # same-ts tie
        (102, 2, "O", None, "2024-06-02 12:00:00", "3-MEDIUM"),  # null price
        (103, None, "F", 10.0, "2024-06-03 23:59:59", None),     # null custkey
        (104, 9999, "O", 10.0, None, "5-LOW"),               # dangling fk, null date
        (105, 5, None, 0.0, "2024-06-05 06:30:00", "4-NOT SPECIFIED"),
        (106, 6, "P", 1e9, "2024-06-06 06:30:00", "1-URGENT"),  # extreme price
    ]
    con.executemany("INSERT INTO o VALUES (?,?,?,?,?,?)", orders)
    con.execute(f"COPY o TO '{RDIR}/orders.parquet' (FORMAT PARQUET)")

    con.execute("""CREATE TABLE l (l_orderkey BIGINT, l_partkey BIGINT,
      l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE,
      l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE,
      l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)""")
    li = [
        (100, 1, 1, 1, None, 100.0, 0.1, 0.02, "N", "O", mid),  # null qty
        (100, 2, 2, 2, 5.0, None, 0.0, 0.0, "R", "F", mid),     # null price
        (100, 3, 1, 3, 5.0, 100.0, 1.0, 0.08, None, None, None),  # 100% disc
        (101, 1, 2, 1, 5.0, -100.0, 0.5, 0.0, "A", "F", "2024-06-01 12:00:00"),
        (101, 1, 2, 1, 5.0, -100.0, 0.5, 0.0, "A", "F",
         "2024-06-01 12:00:00"),                             # exact dup line
        (103, 4, 3, 1, 7.0, 70.0, None, None, "N", "O", "2024-06-03 00:00:00"),
        (104, 5, 1, 1, 7.0, 70.0, 0.0, 0.0, "R", "F", "1970-01-01 00:00:00"),
        (999, 1, 1, 1, 7.0, 70.0, 0.0, 0.0, "N", "O",
         "2024-06-09 00:00:00"),                             # dangling order
    ]
    random.seed(23)
    # hot skew key: one order carries 3000 lines with tied values
    for i in range(3000):
        li.append((106, 1 + i % 7, 1 + i % 4, 4 + i, float(i % 5),
                   round(random.uniform(1, 1000), 2), 0.05, 0.04,
                   random.choice(["N", "R", "A"]), "O",
                   f"2024-06-{6 + i % 3:02d} 06:30:00"))
    con.executemany("INSERT INTO l VALUES (?,?,?,?,?,?,?,?,?,?,?)", li)
    con.execute(f"COPY l TO '{RDIR}/lineitem.parquet' (FORMAT PARQUET)")

    con.execute("""CREATE TABLE p (p_partkey BIGINT, p_name VARCHAR,
      p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE)""")
    parts = [
        (1, "azure metallic thing", "B#1", "TYPE A", 1, 10.0),
        (2, "azure metalic thing", "B#1", "TYPE A", 1, 10.0),  # 1-edit twin
        (3, None, "B#2", None, None, None),                    # null name
        (4, "totally different part", "B#3", "TYPE B", 50, 1e6),
        (5, "azure metallic thing", "B#4", "TYPE A", 1, 10.0), # exact dup name
        (6, "x", None, "TYPE C", -1, -5.0),                    # negatives
        (7, "y", "B#5", "TYPE C", 0, 0.0),
    ]
    con.executemany("INSERT INTO p VALUES (?,?,?,?,?,?)", parts)
    con.execute(f"COPY p TO '{RDIR}/part.parquet' (FORMAT PARQUET)")

    con.execute("""CREATE TABLE s (s_suppkey BIGINT, s_name VARCHAR,
      s_nationkey INTEGER, s_acctbal DOUBLE)""")
    sup = [(1, "Supplier#1", 0, 100.0), (2, None, 1, -100.0),
           (3, "Supplier#3", None, None), (4, "Supplier#4", 24, 0.0)]
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", sup)
    con.execute(f"COPY s TO '{RDIR}/supplier.parquet' (FORMAT PARQUET)")
    print(f"built {RDIR} hostile relational tables "
          f"(lineitem {con.sql('SELECT count(*) FROM l').fetchone()[0]} rows)")


HDIR = "/tmp/adv_html"


def build_html():
    """Crafted-HTML/URL hostile corpus (round 9, for the WebIngest family):
    documents whose TEXT is markup-shaped (tags, entity-lookalikes, bare
    ampersands, CRLF runs that could masquerade as WARC/HTTP terminators)
    and whose SOURCE is URL-hostile (unicode hosts, embedded credentials,
    ports, slashes, mixed case). The renderer must escape all of it, the
    strict parser must round-trip it, the WARC walk must stay
    length-delimited through payloads containing CRLF CRLF, and the URL
    label sanitizer must collapse the hostile sources identically in both
    engines."""
    subprocess.run(["mkdir", "-p", HDIR], check=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{HDIR}/{t}.parquet")
    con = duckdb.connect()
    rows = [
        (0, "<div>hello</div> <p>world</p> the a of and more words here",
         "en", "WEB.Example", 58),                      # literal tags in text
        (1, "&amp; &lt; &gt; &unknown; &#65; & bare ampersand the a of and",
         "en", "user:pw@host", 60),                     # entity lookalikes
        (2, "quote \" and ' apos < > & mixed the a of and words",
         "en", "host:80", 50),                          # escapable chars
        (3, "line1\r\nline2\r\n\r\nline3 the a of and padding words here",
         "en", "日本語ホスト", 52),                      # CRLF CRLF inside payload
        (4, "</html> trailing close the a of and words to pass the gate",
         "en", None, 58),                               # close-tag text, null src
        (5, "<script>alert(1)</script> <style>p{}</style> the a of and",
         "en", "", 57),                                 # raw-container text
        (6, "<!-- comment --> <!DOCTYPE html> the a of and words here",
         "en", "a b c", 56),                            # declaration text
        (7, "x" * 50000 + " <b>bold</b> the a of and", "en", "UPPERCASE",
         50026),                                        # huge word + tags
        (8, "😀<p>😀</p>😀 café café the a of and words here",
         "en", "with/slash?q=1#f", 50),                 # unicode + tags
        (9, None, None, None, None),                    # all-null row
        (10, "%61 %2F %zz percent lookalikes the a of and words here",
         "en", "pct%41src", 54),                        # %-escapes in text/src
        (11, "  <p>  </p>  double  spaces  the a of and  ", "en",
         "-dash-host-", 44),                            # empties + tags
        (12, "\ufeffBOM-leading text the a of and words here", "en",
         "bom-src", 44),                                # U+FEFF sniff edge
        (13, "astral \U0001F600\U0001F600 pair text the a of and", "en",
         "astral", 40),                                 # utf-16 pairs
    ]
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{HDIR}/documents.parquet' (FORMAT PARQUET)")
    print(f"built {HDIR}/documents.parquet with "
          f"{con.sql('SELECT count(*) FROM d').fetchone()[0]} hostile docs")


if __name__ == "__main__":
    build_relational()
    build_html()
    sys.exit(main())
