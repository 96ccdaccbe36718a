"""Incremental MinHash-LSH maintenance (cdc/incremental_dedup.py): folding
per-window pair deltas must reproduce the batch recompute bit-for-bit, the
index must inherit the lake's exactly-once contract, and pair extraction
must be a pure function of two index versions."""

import random

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import KEY_COLS, LakeTable, MinHashLshIndex
from valentine_spark.cdc.incremental_dedup import PAIR_COLS
from valentine_spark.operators.dedup import minhash_lsh_pairs

N, K, BANDS = 5, 8, 4


def _key(i):
    return (f"repo{i % 3}", f"src/f{i}.py", "head")


def _texts(seed=7, n_docs=24, n_families=5):
    """Docs in near-dup families: a long shared base per family plus a tiny
    per-doc suffix mutation — guaranteed band collisions within families."""
    rng = random.Random(seed)
    bases = [
        "".join(rng.choice("abcdefgh ") for _ in range(120)) for _ in range(n_families)
    ]
    return {
        _key(i): bases[i % n_families] + rng.choice(["", "x", "yz"])
        for i in range(n_docs)
    }


def _changes_df(spark, ups: dict, dels=()):
    rows = [(*k, "update", t) for k, t in ups.items()]
    rows += [(*k, "delete", None) for k in dels]
    schema = ", ".join(
        f"{c} string" for c in KEY_COLS + ["change_op", "content"]
    )
    return spark.createDataFrame(rows, schema)


def _pairset(df):
    return {
        frozenset([tuple(r[f"{c}_a"] for c in KEY_COLS),
                   tuple(r[f"{c}_b"] for c in KEY_COLS)])
        for r in df.collect()
    }


def _batch_pairs(spark, state: dict):
    """Oracle: the batch operator over the same corpus state (ids joined
    with a separator no key uses, split back after)."""
    df = spark.createDataFrame(
        [("\x1f".join(k), t) for k, t in state.items()], ["doc_id", "text"]
    )
    out = minhash_lsh_pairs(df, "doc_id", "text", n=N, k=K, bands=BANDS)
    return {
        frozenset([tuple(r["id_a"].split("\x1f")), tuple(r["id_b"].split("\x1f"))])
        for r in out.collect()
    }


@pytest.fixture
def index(spark, tmp_path):
    return MinHashLshIndex.create(
        str(tmp_path / "idx"), spark, n=N, k=K, bands=BANDS, n_buckets=4
    )


def test_fold_equals_batch_recompute(spark, index):
    """Three windows of inserts/updates/deletes: folding pair_delta across
    them equals the batch LSH on the final state AND the index's own full
    pairs() view — at every checkpoint."""
    texts = _texts()
    keys = list(texts)
    windows = [
        ({k: texts[k] for k in keys[:10]}, []),
        ({k: texts[k] for k in keys[10:20]}, keys[:2]),           # del 2 early docs
        ({keys[0]: texts[keys[0]], **{k: texts[k] for k in keys[20:]}},
         [keys[11]]),                                             # re-insert + del
    ]
    state, folded = {}, set()
    for ups, dels in windows:
        v0 = index.version
        index.update(_changes_df(spark, ups, dels), batch_id=f"w{v0}")
        delta = index.pair_delta(v0).collect()
        for r in delta:
            p = frozenset([tuple(r[f"{c}_a"] for c in KEY_COLS),
                           tuple(r[f"{c}_b"] for c in KEY_COLS)])
            if r["pair_op"] == "added":
                assert p not in folded, f"duplicate add {p}"
                folded.add(p)
            else:
                assert p in folded, f"removed unknown pair {p}"
                folded.discard(p)
        for k in dels:
            state.pop(k, None)
        state.update(ups)
        assert folded == _batch_pairs(spark, state)
        assert folded == _pairset(index.pairs())


def test_pair_delta_is_replayable(spark, index):
    texts = _texts(seed=3, n_docs=12)
    ks = list(texts)
    index.update(_changes_df(spark, {k: texts[k] for k in ks[:8]}), batch_id="a")
    v0 = index.version
    index.update(
        _changes_df(spark, {k: texts[k] for k in ks[8:]}, [ks[0]]), batch_id="b"
    )
    one = sorted(map(tuple, index.pair_delta(v0).collect()))
    two = sorted(map(tuple, index.pair_delta(v0).collect()))
    assert one == two and len(one) > 0


def test_update_is_exactly_once(spark, index):
    texts = _texts(seed=5, n_docs=6)
    df = _changes_df(spark, texts)
    index.update(df, batch_id="once")
    v = index.version
    res = index.update(df, batch_id="once")
    assert res.get("skipped") is True and index.version == v


def test_unchanged_signature_emits_no_delta(spark, index):
    """Re-upserting identical content is a value-identical index row: the
    lake changelog reports nothing, so the pair delta is empty."""
    texts = _texts(seed=11, n_docs=8)
    index.update(_changes_df(spark, texts), batch_id="a")
    v0 = index.version
    index.update(_changes_df(spark, texts), batch_id="b")
    assert index.pair_delta(v0).count() == 0


def test_delete_retracts_pairs(spark, index):
    base = "q" * 100
    docs = {_key(i): base for i in range(3)}  # all mutually paired
    index.update(_changes_df(spark, docs), batch_id="a")
    assert len(_pairset(index.pairs())) == 3
    v0 = index.version
    index.update(_changes_df(spark, {}, [_key(0)]), batch_id="b")
    delta = index.pair_delta(v0)
    assert delta.where("pair_op = 'added'").count() == 0
    assert delta.where("pair_op = 'removed'").count() == 2
    assert len(_pairset(index.pairs())) == 1


def test_open_validates_parameters(spark, tmp_path):
    plain = LakeTable.create(str(tmp_path / "t"), spark, n_buckets=2)
    with pytest.raises(ValueError, match="not a MinHashLshIndex"):
        MinHashLshIndex(plain)
    idx = MinHashLshIndex.create(str(tmp_path / "i"), spark, n=N, k=K, bands=BANDS)
    again = MinHashLshIndex.open(str(tmp_path / "i"), spark)
    assert (again.n, again.k, again.bands) == (N, K, BANDS)


def test_bad_band_split_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="multiple"):
        MinHashLshIndex.create(str(tmp_path / "x"), spark, k=8, bands=3)


def test_fuzz_schedule_matches_recompute(spark, tmp_path):
    """Randomized op schedule (seeded): insert/update/delete over a small
    key universe, fold deltas, compare to batch recompute at 3 checkpoints."""
    rng = random.Random(42)
    idx = MinHashLshIndex.create(
        str(tmp_path / "f"), spark, n=N, k=K, bands=BANDS, n_buckets=4
    )
    bases = ["".join(rng.choice("mnopqr ") for _ in range(90)) for _ in range(4)]
    universe = [_key(i) for i in range(14)]
    state, folded = {}, set()
    for step in range(6):
        ups, dels = {}, []
        for k in rng.sample(universe, rng.randint(2, 6)):
            if k in state and rng.random() < 0.3:
                dels.append(k)
            else:
                ups[k] = rng.choice(bases) + rng.choice(["", "s", "tt"])
        v0 = idx.version
        idx.update(_changes_df(spark, ups, dels), batch_id=f"s{step}")
        for r in idx.pair_delta(v0).collect():
            p = frozenset([tuple(r[f"{c}_a"] for c in KEY_COLS),
                           tuple(r[f"{c}_b"] for c in KEY_COLS)])
            folded.add(p) if r["pair_op"] == "added" else folded.discard(p)
        for k in dels:
            state.pop(k, None)
        state.update(ups)
        if step % 2 == 1:
            assert folded == _batch_pairs(spark, state), f"diverged at step {step}"
    assert folded == _batch_pairs(spark, state)


def test_follower_feeds_index_exactly_once(spark, tmp_path):
    """End-to-end wiring: source lake -> ChangelogFollower -> index.update
    with the delivery token.  A crash between index update and follower
    commit re-polls the SAME delivery; the token makes the re-update a
    no-op and pair_delta recomputes verbatim."""
    from valentine_spark.cdc import ChangelogFollower, synth_change_stream
    from valentine_spark.cdc.apply import replay

    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=4)
    stream = synth_change_stream(spark, 600, 80)
    replay(src, stream.where("lsn < 300"), batch_lsns=300)
    idx = MinHashLshIndex.create(
        str(tmp_path / "idx"), spark, n=N, k=K, bands=BANDS, n_buckets=4
    )
    fol = ChangelogFollower(src, str(tmp_path / "ck"), consumer_id="lsh")
    d = fol.poll()
    v0 = idx.version
    idx.update(d.df, batch_id=d.token)
    first = sorted(map(tuple, idx.pair_delta(v0).collect()))
    # crash before commit: the re-poll reproduces the delivery; the token
    # short-circuits the merge and the delta replays identically
    d2 = fol.poll()
    assert d2.token == d.token
    res = idx.update(d2.df, batch_id=d2.token)
    assert res.get("skipped") is True
    assert sorted(map(tuple, idx.pair_delta(v0).collect())) == first
    fol.commit(d2)
    # second wave drains through the same loop and fold == full view
    replay(src, stream.where("lsn >= 300"), batch_lsns=300, batch_id_prefix="w2")
    net = idx.pair_delta(0).where("pair_op = 'added'").count() - \
        idx.pair_delta(0).where("pair_op = 'removed'").count()
    while (d := fol.poll()) is not None:
        v0 = idx.version
        idx.update(d.df, batch_id=d.token)
        delta = idx.pair_delta(v0).collect()
        net += sum(1 if r["pair_op"] == "added" else -1 for r in delta)
        fol.commit(d)
    assert net == idx.pairs().count()


def test_user_properties_roundtrip(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "p"), spark, n_buckets=2)
    t.alter_properties(set={"owner": "ingest", "tier": "gold"})
    assert t.properties() == {"owner": "ingest", "tier": "gold"}
    t.alter_properties(set={"tier": "silver"}, unset=["owner", "absent"])
    assert t.properties() == {"tier": "silver"}
    with pytest.raises(TypeError):
        t.alter_properties(set={"n": 3})
    # survives an unrelated data commit and a restore (head values win)
    from valentine_spark.cdc import synth_change_stream
    from valentine_spark.cdc.apply import replay

    v_before = t.version
    replay(t, synth_change_stream(spark, 200, 50), batch_lsns=200)
    assert t.properties() == {"tier": "silver"}
    t.restore(v_before)
    assert t.properties() == {"tier": "silver"}
