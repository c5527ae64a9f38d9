"""Adversarial-domain stress corpus for the oracle sweep (r10, VERDICT r9 #1).

Generates the same ten-table schema as the driver's testdata (exact
pyarrow physical types: timestamp[us], int32 keys where the driver has
them, list<float32> embeddings) but with adversarial CONTENT designed to
flush data-dependent cross-engine hash luck that the benign sf0.01 grade
cannot see:

- empty groups            nations 20-24 have no customers/suppliers; some
                          customers have zero orders; some orders have
                          zero lineitems; one doc source unused
- single-row partitions   users with exactly one event; labels with one
                          vector; orders with one lineitem
- skew                    customer 0 owns ~13% of orders; order 1 has 300
                          lineitems; user 1 has 20% of events
- ties everywhere         duplicated totalprice/acctbal/value/quantity,
                          identical timestamps, duplicate texts/vectors
- zero-variance groups    all nation-7 acctbals == 100.0; user 77 'error'
                          events all value == 7.0; label 9 vectors identical
- all-NULL column         supplier.s_acctbal is entirely NULL
- scattered NULLs         c_acctbal, o_totalprice, events.value/props
- pre-1970 dates          o_orderdate / l_shipdate / events.ts before the
                          epoch (negative micros — flushes div-vs-floor)
- empty / tiny docs       text == "", whitespace-only, 1- and 2-token docs
- non-ASCII text          accents, CJK, emoji (non-BMP), zero-width space,
                          combining accents, RTL — flushes byte-vs-char
                          length math and charset-dependent hash bridges
- bracket charset         words containing [ ] (BPE chain-SQL trap)
- orphan foreign keys     orders with custkeys that have no customer row
- degenerate vectors      all-zero embeddings (cosine 0/0), exact and
                          near duplicate vectors

Deterministic (fixed seed); output goes to .stressdata/ (gitignored) with
a VERSION marker so tests regenerate when this file's STRESS_VERSION
bumps.  Usage: python tools/gen_stress_data.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRESS_VERSION = 8
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".stressdata")

SEED = 20260814

WORDS = (
    "key agg row scan slow fast table value part hash join batch window "
    "spark order data column customer filter small merge vector line "
    "stream group a big sort query the dup"
).split()
PART_ADJ = ["small", "red", "blue", "hot", "cold", "new", "old", "large"]
PART_NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "anvil", "plate", "rod"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "FURNITURE", "BUILDING", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "zh", "fr", "de", "es"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

US_PER_DAY = 86_400_000_000


def _day_us(y: int, m: int, d: int) -> int:
    import datetime as dt

    return int(
        (dt.datetime(y, m, d) - dt.datetime(1970, 1, 1)).total_seconds()
    ) * 1_000_000


def _ts_array(micros):
    return pa.array(np.asarray(micros, dtype=np.int64), type=pa.timestamp("us"))


def gen_region():
    return pa.table(
        {
            "r_regionkey": pa.array(range(5), type=pa.int32()),
            "r_name": pa.array(REGIONS),
        }
    )


def gen_nation():
    # nations 20-24: empty groups (no customers/suppliers reference them);
    # two non-ASCII names stress unicode group-by keys end to end.
    names = [f"NATION_{i}" for i in range(25)]
    names[23] = "NATIÖN_23"
    names[24] = "國家_24"
    return pa.table(
        {
            "n_nationkey": pa.array(range(25), type=pa.int32()),
            "n_name": pa.array(names),
            "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
        }
    )


def gen_customer(rng):
    n = 300
    keys = np.arange(n, dtype=np.int64)
    nat = rng.randint(0, 20, size=n).astype(np.int32)  # nations 20-24 empty
    bal = np.round(rng.uniform(-999, 9999, size=n), 2)
    bal[rng.rand(n) < 0.10] = 0.0            # heavy ties at exactly 0
    bal[bal > 9000] = 9999.99                 # ties at the max
    bal[nat == 7] = 100.0                     # zero-variance group
    bal_null = rng.rand(n) < 0.05
    return pa.table(
        {
            "c_custkey": pa.array(keys),
            "c_name": pa.array([f"Customer#{i:09d}" for i in keys]),
            "c_nationkey": pa.array(nat, type=pa.int32()),
            "c_acctbal": pa.array(
                [None if m else float(v) for v, m in zip(bal, bal_null)],
                type=pa.float64(),
            ),
            "c_mktsegment": pa.array([SEGMENTS[i % 5] for i in keys]),
        }
    )


def gen_supplier(rng):
    n = 40
    keys = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "s_suppkey": pa.array(keys),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in keys]),
            "s_nationkey": pa.array(
                rng.randint(0, 20, size=n).astype(np.int32), type=pa.int32()
            ),
            # the all-NULL column from the stress list
            "s_acctbal": pa.array([None] * n, type=pa.float64()),
        }
    )


def gen_part(rng):
    n = 400
    keys = np.arange(n, dtype=np.int64)
    names = [
        f"{PART_ADJ[rng.randint(len(PART_ADJ))]} {PART_NOUN[rng.randint(len(PART_NOUN))]}"
        for _ in range(n)
    ]
    names[5] = "höt gízmo"          # non-ASCII in a LIKE-scanned column
    names[6] = "red [widget]"       # bracket charset
    names[7] = "blue_bolt 100%"     # LIKE metacharacters as literals
    price = np.round(rng.uniform(100, 2000, size=n), 2)
    price[::37] = 901.0             # ties
    price[11] = 0.0
    size = rng.randint(1, 51, size=n).astype(np.int32)
    size[13] = 0
    return pa.table(
        {
            "p_partkey": pa.array(keys),
            "p_name": pa.array(names),
            "p_brand": pa.array([f"Brand#{1 + int(i) % 25}" for i in keys]),
            "p_type": pa.array([P_TYPES[rng.randint(len(P_TYPES))] for _ in range(n)]),
            "p_size": pa.array(size, type=pa.int32()),
            "p_retailprice": pa.array(price, type=pa.float64()),
        }
    )


def gen_orders(rng):
    n = 1500
    keys = np.arange(n, dtype=np.int64)
    # skew: customer 0 owns ~200 orders; customers 250-299 own none;
    # ~10 orphan custkeys (no customer row) exercise unmatched outer rows.
    cust = rng.randint(0, 250, size=n)
    cust[:200] = 0
    cust[200:210] = 500 + np.arange(10)
    rng.shuffle(cust)
    status = np.array(["F", "O", "P"])[rng.randint(0, 3, size=n)]
    price = np.round(rng.uniform(1000, 300000, size=n), 2)
    price[::11] = 50000.0           # ties everywhere
    price_null = rng.rand(n) < 0.03
    # dates: mostly 1995-2001, ~40 pre-1970 (negative epoch), a few at epoch
    base = _day_us(1995, 1, 1)
    dates = base + rng.randint(0, 2400, size=n).astype(np.int64) * US_PER_DAY
    pre = rng.choice(n, size=40, replace=False)
    dates[pre] = _day_us(1965, 1, 1) + rng.randint(0, 1800, size=40).astype(
        np.int64
    ) * US_PER_DAY
    dates[7] = 0                    # exactly the epoch
    dates[8] = _day_us(1969, 12, 31)
    dates[::13] = _day_us(1997, 6, 15)  # massive date tie
    return pa.table(
        {
            "o_orderkey": pa.array(keys),
            "o_custkey": pa.array(cust.astype(np.int64)),
            "o_orderstatus": pa.array(status),
            "o_totalprice": pa.array(
                [None if m else float(v) for v, m in zip(price, price_null)],
                type=pa.float64(),
            ),
            "o_orderdate": _ts_array(dates),
            "o_orderpriority": pa.array(
                [PRIORITIES[i] for i in rng.randint(0, 5, size=n)]
            ),
        }
    )


def gen_lineitem(rng, orders):
    o_keys = orders.column("o_orderkey").to_pylist()
    o_dates = np.asarray(orders.column("o_orderdate").cast(pa.int64()).to_pylist())
    rows_per = rng.randint(1, 8, size=len(o_keys))
    rows_per[rng.rand(len(o_keys)) < 0.10] = 0   # orders with no lineitems
    rows_per[1] = 300                            # one giant basket (skew)
    rows_per[2] = 1                              # single-row partitions
    ok, pk, sk, ln, qty, ep, disc, tax, rf, ls, sd = (
        [], [], [], [], [], [], [], [], [], [], [],
    )
    for oi, okey in enumerate(o_keys):
        for j in range(rows_per[oi]):
            ok.append(okey)
            pk.append(int(rng.randint(0, 400)) if rng.rand() > 0.15 else 0)  # part 0 hot
            sk.append(int(rng.randint(0, 40)))
            ln.append(j + 1)
            q = float(rng.randint(1, 51))
            if rng.rand() < 0.2:
                q = 25.0                         # quantity ties
            qty.append(q)
            p = round(float(rng.uniform(900, 100000)), 2)
            ep.append(5000.0 if rng.rand() < 0.1 else p)
            disc.append(round(float(rng.randint(0, 11)) / 100.0, 2))
            tax.append(round(float(rng.randint(0, 9)) / 100.0, 2))
            rf.append(["R", "A", "N"][rng.randint(0, 3)])
            ls.append(["O", "F"][rng.randint(0, 2)])
            # shipdate: order date + 0..120 days; 0 lag common (ties with
            # o_orderdate); pre-1970 orders keep pre-1970 shipdates
            lag = 0 if rng.rand() < 0.15 else int(rng.randint(0, 121))
            sd.append(int(o_dates[oi]) + lag * US_PER_DAY)
    n = len(ok)
    return pa.table(
        {
            "l_orderkey": pa.array(np.asarray(ok, dtype=np.int64)),
            "l_partkey": pa.array(np.asarray(pk, dtype=np.int64)),
            "l_suppkey": pa.array(np.asarray(sk, dtype=np.int64)),
            "l_linenumber": pa.array(np.asarray(ln, dtype=np.int32), type=pa.int32()),
            "l_quantity": pa.array(qty, type=pa.float64()),
            "l_extendedprice": pa.array(ep, type=pa.float64()),
            "l_discount": pa.array(disc, type=pa.float64()),
            "l_tax": pa.array(tax, type=pa.float64()),
            "l_returnflag": pa.array(rf),
            "l_linestatus": pa.array(ls),
            "l_shipdate": _ts_array(sd),
        }
    ), n


def gen_events(rng):
    n = 2000
    ids = np.arange(n, dtype=np.int64)
    # users: user 1 skewed (20%); users 90-99 exactly one event each;
    # nation of ordinary users 0-49
    users = rng.randint(0, 50, size=n).astype(np.int64)
    users[: n // 5] = 1
    one_shot = rng.choice(np.arange(n // 5, n), size=10, replace=False)
    users[one_shot] = 90 + np.arange(10)
    rng.shuffle(users)
    # timestamps: epoch-straddling — main cluster starts 1970-01-05 (the
    # Monday week anchor), adversarial tail reaches back into 1969 so
    # unix_micros/datediff go NEGATIVE (div-vs-floor flush) while the
    # total span stays ~52 days: grid/densify operators stay bounded
    # (a 1969→2024 span made resample_gapfill's 15-min grid a ~10M-row
    # result that OOM'd the vanilla driver session in sweep 1).
    base = _day_us(1970, 1, 5)
    ts = base + np.sort(rng.randint(0, 36 * 86_400, size=n)).astype(np.int64) * 1_000_000
    # sub-second microsecond jitter (driver data has it too): fractional
    # seconds make epoch()-floor vs `div`-truncate bucket math divergent
    # on the negative side — integral seconds would mask that trap
    ts = ts + rng.randint(0, 1_000_000, size=n).astype(np.int64)
    ts[100:130] = ts[100]                       # 30-way timestamp tie
    ts[500:510] = ts[500]
    swap = rng.choice(n - 1, size=60, replace=False)
    ts[swap], ts[swap + 1] = ts[swap + 1].copy(), ts[swap].copy()  # late events
    pre = rng.choice(n, size=50, replace=False)
    ts[pre] = _day_us(1969, 12, 20) + rng.randint(0, 16 * 86_400, size=50).astype(
        np.int64
    ) * 1_000_000
    ts[pre[0]] = 0                              # exactly the epoch
    ts[pre[1]] = -1                             # one microsecond before it
    # ~2% NULL user_id (dropped devices / consent-stripped rows): the
    # NULL-key discipline of groupBy/window/join must agree per engine
    user_null = rng.rand(n) < 0.02
    etype = np.array(EVENT_TYPES)[rng.randint(0, 5, size=n)]
    value = np.round(rng.uniform(0.01, 490, size=n), 2)
    value[::9] = 42.0                           # ties
    zero_var = (users == 77) & (etype == "error")
    value[zero_var] = 7.0                       # zero-variance group
    value_null = rng.rand(n) < 0.05
    props = []
    for i in range(n):
        r = rng.rand()
        if r < 0.15:
            props.append(None)                  # NULL props
        elif r < 0.18:
            props.append("not json at all")     # corrupt JSON
        elif r < 0.20:
            props.append("")                    # empty string
        elif r < 0.25:
            props.append('{"k": %d, "nested": {"a": [1, 2]}}' % rng.randint(0, 100))
        else:
            props.append('{"k": %d}' % rng.randint(0, 100))
    return pa.table(
        {
            "event_id": pa.array(ids),
            "ts": _ts_array(ts),
            "user_id": pa.array(
                [None if m else int(u) for u, m in zip(users, user_null)],
                type=pa.int64(),
            ),
            "event_type": pa.array(etype.tolist()),
            "value": pa.array(
                [None if m else float(v) for v, m in zip(value, value_null)],
                type=pa.float64(),
            ),
            "props": pa.array(props, type=pa.string()),
        }
    )


def gen_documents(rng):
    texts: list[str] = []

    def bank_doc(k):
        return " ".join(WORDS[rng.randint(0, len(WORDS))] for _ in range(k))

    # ~120 ordinary docs from the same vocabulary (tfidf/bm25 keep working)
    for _ in range(120):
        texts.append(bank_doc(int(rng.randint(20, 80))))
    # exact duplicates: 10 pairs
    for i in range(10):
        d = bank_doc(40)
        texts += [d, d]
    # near duplicates: one word changed
    for i in range(8):
        w = bank_doc(40).split()
        texts.append(" ".join(w))
        w[5] = "mutated"
        texts.append(" ".join(w))
    # empty / whitespace / tiny docs
    texts += ["", "", "", " ", "  \t ", "solo", "two tokens", "a b"]
    # non-ASCII: accents, CJK, emoji (non-BMP), zero-width space inside a
    # word, combining accent, RTL
    texts += [
        "héllo wörld schön größe straße",
        "数据 处理 引擎 非常 快速 数据 引擎",
        "rocket 🚀 emoji 🎉 data 🚀 stream",
        "zero​width joined word stream",
        "combining é accent résumé test",
        "مرحبا بالعالم بيانات سريعة",
        "mixé ascii ünd utf8 wörds tögether",
    ]
    # bracket charset (BPE chain-SQL trap) and regex metacharacters
    texts += [
        "foo[1] bar]2[ baz[] qux",
        "regex .* meta (chars) | and + here",
        'quote "embedded" and \'single\' quotes',
    ]
    # embedded newline / tab (CSV round-trip stress)
    texts += ["line one\nline two\ttabbed", "trailing newline\n"]
    # pathological repetition (Gopher) and one long doc
    texts += [
        "spam " * 200,
        ("long document " + bank_doc(600))[:5000],
    ]
    # NULL text rows (a 100 TB corpus always has some): appended LAST
    # so the pair-aligned lang assignment above stays pair-aligned
    null_text_ids = 2
    n = len(texts) + null_text_ids
    # pair-aligned langs: duplicate/near-dup pairs are consecutive, so
    # i//2 keeps each pair in ONE lang — lang-blocked dedup operators
    # must see the planted pairs (i%5 split every pair across blocks
    # and made their stress rows vacuously empty)
    langs = [LANGS[(i // 2) % 5] for i in range(n)]
    sources = [f"src{i % 18}" for i in range(n)]  # src18/src19 empty groups
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts + [None] * null_text_ids),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                [len(t) for t in texts] + [None] * null_text_ids,
                type=pa.int64(),
            ),
        }
    )


def gen_embeddings(rng):
    dim, n = 64, 400
    # 4 clusters, values quantized to 1/64 (exact in float32)
    centers = rng.randn(4, dim)
    vecs = np.zeros((n, dim), dtype=np.float32)
    labels = np.zeros(n, dtype=np.int32)
    for i in range(n):
        c = i % 4
        v = centers[c] + 0.3 * rng.randn(dim)
        vecs[i] = np.round(v * 64) / 64.0
        labels[i] = c * 2 + int(rng.rand() < 0.5)
    # degenerate rows
    vecs[0] = 0.0                               # zero vector (cosine 0/0)
    vecs[1] = 0.0
    for i in range(10):                         # exact duplicate pairs
        vecs[10 + 2 * i + 1] = vecs[10 + 2 * i]
    vecs[40] = vecs[41] = vecs[42]              # 3-way tie
    one_hot = np.zeros(dim, dtype=np.float32)
    one_hot[3] = 1.0
    vecs[50] = one_hot
    labels[395:] = 8                            # label 8 small group
    labels[399] = 9                             # single-row group
    vecs[labels == 8] = vecs[395]               # zero-variance label
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )


def main(out_dir: str = DEFAULT_OUT) -> str:
    marker = os.path.join(out_dir, "VERSION")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == str(STRESS_VERSION):
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(SEED)
    tables = {
        "region": gen_region(),
        "nation": gen_nation(),
        "customer": gen_customer(rng),
        "supplier": gen_supplier(rng),
        "part": gen_part(rng),
        "orders": gen_orders(rng),
        "events": gen_events(rng),
        "documents": gen_documents(rng),
        "embeddings": gen_embeddings(rng),
    }
    tables["lineitem"], n_li = gen_lineitem(rng, tables["orders"])
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as fh:
        fh.write(str(STRESS_VERSION))
    print(f"stress corpus v{STRESS_VERSION} -> {out_dir} (lineitem {n_li} rows)")
    return out_dir


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
