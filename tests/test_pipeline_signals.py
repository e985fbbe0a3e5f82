"""Intent tests (beyond oracle parity) for the round-4 training-data
pipeline signals: within-doc repetition, cross-doc boilerplate,
mixture weights, and SemDeDup cluster-scoped semantic dedup.

Oracle parity proves Spark and DuckDB agree; these tests pin that the
agreed-on answer is the INTENDED one, on fixtures where the right
answer is hand-computable.
"""

from __future__ import annotations

import math

import pytest

from mapreduce_rs_spark.operators.curation import mixture_weights
from mapreduce_rs_spark.operators.text_analysis import (
    boilerplate_ngrams,
    repetition_signals,
)


def _by_doc(rows):
    return {r["doc_id"]: r for r in rows}


def test_repetition_signals_hand_computed(spark):
    rows = [
        (1, "spam spam spam spam"),
        (2, "all words here are different okay"),
        (3, ""),
        (4, "one two one two one two"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _by_doc(repetition_signals(df).collect())
    assert set(got) == {1, 2, 3, 4}

    # Degenerate doc: one token repeated 4x.
    assert got[1]["n_tokens"] == 4
    assert got[1]["dup_token_ratio"] == pytest.approx(3 / 4)
    assert got[1]["top_token_ratio"] == pytest.approx(1.0)
    assert got[1]["top_bigram_ratio"] == pytest.approx(1.0)  # "spam spam" x3

    # Fully diverse doc.
    assert got[2]["n_tokens"] == 6
    assert got[2]["dup_token_ratio"] == pytest.approx(0.0)
    assert got[2]["top_token_ratio"] == pytest.approx(1 / 6)
    assert got[2]["top_bigram_ratio"] == pytest.approx(1 / 5)

    # Empty doc survives with NULL ratios, not a dropped row.
    assert got[3]["n_tokens"] == 0
    assert got[3]["dup_token_ratio"] is None
    assert got[3]["top_token_ratio"] is None
    assert got[3]["top_bigram_ratio"] is None

    # Alternating pattern: bigram "one two" x3 of 5 bigrams.
    assert got[4]["n_tokens"] == 6
    assert got[4]["dup_token_ratio"] == pytest.approx(4 / 6)
    assert got[4]["top_token_ratio"] == pytest.approx(3 / 6)
    assert got[4]["top_bigram_ratio"] == pytest.approx(3 / 5)


def test_boilerplate_ngrams_flags_planted_template_only(spark):
    # "lorem ipsum dolor" appears in 3 docs (= min_docs); every other
    # 3-gram is unique to its document, so exactly one gram per planted
    # doc is boilerplate.
    rows = [
        (1, "lorem ipsum dolor unique1a unique1b", "en"),
        (2, "lorem ipsum dolor unique2a unique2b", "en"),
        (3, "lorem ipsum dolor unique3a unique3b", "en"),
        (4, "totally different text sample four", "en"),
        (5, "xy", "en"),  # 1 token -> zero 3-grams -> NULL ratio
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = _by_doc(boilerplate_ngrams(df).collect())
    for d in (1, 2, 3):
        assert got[d]["n_grams"] == 3
        assert got[d]["n_boilerplate"] == 1
        assert got[d]["boilerplate_ratio"] == pytest.approx(1 / 3)
    assert got[4]["n_grams"] == 3
    assert got[4]["n_boilerplate"] == 0
    assert got[4]["boilerplate_ratio"] == pytest.approx(0.0)
    assert got[5]["n_grams"] == 0
    assert got[5]["boilerplate_ratio"] is None


def test_mixture_weights_uniform_language_target(spark):
    rows = [
        (1, "w w w w", "en", "a", 0),
        (2, "x x", "en", "b", 0),
        (3, "y y y", "de", "a", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {(r["lang"], r["source"]): r for r in mixture_weights(df).collect()}
    assert set(got) == {("en", "a"), ("en", "b"), ("de", "a")}

    # Hand-computed: total=9 tokens, n_langs=2.
    assert got[("en", "a")]["n_tokens"] == 4
    assert got[("en", "a")]["actual_share"] == pytest.approx(4 / 9)
    assert got[("en", "a")]["target_share"] == pytest.approx(4 / 12)
    assert got[("en", "a")]["weight"] == pytest.approx(0.75)
    assert got[("en", "a")]["expected_epochs"] == pytest.approx(0.75)
    assert got[("de", "a")]["weight"] == pytest.approx(1.5)
    assert got[("de", "a")]["expected_epochs"] == pytest.approx(1.5)

    # Invariants: target shares sum to 1; each language gets an equal
    # 1/n_langs slice; within a language every source shares one weight.
    assert math.isclose(sum(r["target_share"] for r in got.values()), 1.0)
    en_total = sum(r["target_share"] for k, r in got.items() if k[0] == "en")
    de_total = sum(r["target_share"] for k, r in got.items() if k[0] == "de")
    assert math.isclose(en_total, 0.5) and math.isclose(de_total, 0.5)
    assert got[("en", "a")]["weight"] == pytest.approx(got[("en", "b")]["weight"])


def test_mixture_weights_custom_targets(spark):
    """A custom per-language target mix: en gets 3/4, de 1/4. A language
    missing from the config gets NULL shares (loud config gap)."""
    rows = [
        (1, "w w w w", "en", "a", 0),
        (2, "x x", "en", "b", 0),
        (3, "y y y", "de", "a", 0),
        (4, "z z", "fr", "a", 0),  # not in the target map
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {
        (r["lang"], r["source"]): r
        for r in mixture_weights(df, {"en": 0.75, "de": 0.25}).collect()
    }
    # en buckets: lang_total=6, target 0.75 split 4:2.
    assert got[("en", "a")]["target_share"] == pytest.approx(0.75 * 4 / 6)
    assert got[("en", "b")]["target_share"] == pytest.approx(0.75 * 2 / 6)
    # total=11 tokens; weight = target/actual.
    assert got[("en", "a")]["actual_share"] == pytest.approx(4 / 11)
    assert got[("en", "a")]["weight"] == pytest.approx((0.75 * 4 / 6) / (4 / 11))
    assert got[("de", "a")]["target_share"] == pytest.approx(0.25)
    assert got[("fr", "a")]["target_share"] is None
    assert got[("fr", "a")]["weight"] is None


def test_curation_yield_signals_gates_only_reduce(spark, sf_dir):
    from mapreduce_rs_spark.operators.curation import (
        curation_yield,
        curation_yield_signals,
    )
    from mapreduce_rs_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = {r["lang"]: r for r in curation_yield(docs).collect()}
    gated = {r["lang"]: r for r in curation_yield_signals(docs).collect()}
    assert set(base) == set(gated)
    for lang in base:
        assert gated[lang]["n_docs_in"] == base[lang]["n_docs_in"]
        assert gated[lang]["n_docs_kept"] <= base[lang]["n_docs_kept"]
        assert gated[lang]["n_tokens_kept"] <= base[lang]["n_tokens_kept"]
    # The gates bite on the synthetic corpus (calibrated thresholds).
    assert sum(g["n_docs_kept"] for g in gated.values()) < sum(
        b["n_docs_kept"] for b in base.values()
    )


def test_curation_yield_signals_drops_planted_degenerate_doc(spark):
    """A repetitive doc that passes every v1 gate (length, alpha, lang,
    unique text) must be dropped by the dup_token_ratio gate; a diverse
    doc of the same length survives."""
    from mapreduce_rs_spark.operators.curation import curation_yield_signals

    degenerate = " ".join(["spam"] * 12)  # 12 tokens, dup ratio 11/12
    diverse = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    rows = [(1, degenerate, "en", "s", 0), (2, diverse, "en", "s", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r["lang"]: r for r in curation_yield_signals(df).collect()}
    assert got["en"]["n_docs_in"] == 2
    assert got["en"]["n_docs_kept"] == 1
    assert got["en"]["n_tokens_kept"] == 12  # the diverse doc's tokens


def test_chunk_documents_hand_computed(spark):
    from mapreduce_rs_spark.operators.text_analysis import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        chunk_documents,
    )

    toks30 = [f"t{i}" for i in range(30)]
    rows = [
        (1, " ".join(toks30)),  # 30 tokens -> chunks at 0, 12, 24
        (2, "just a few tokens"),  # 4 tokens -> one partial chunk
        (3, ""),  # no tokens -> no chunks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}

    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in c1] == [16, 16, 6]
    assert c1[0]["chunk_text"].split() == toks30[:16]
    assert c1[1]["chunk_text"].split() == toks30[12:28]  # overlap of 4
    assert c1[2]["chunk_text"].split() == toks30[24:]
    # Every token covered; consecutive chunks overlap by window - stride.
    assert set(toks30) == {t for r in c1 for t in r["chunk_text"].split()}
    assert CHUNK_WINDOW - CHUNK_STRIDE == 4

    (c2,) = by_doc[2]
    assert c2["chunk_idx"] == 0 and c2["n_chunk_tokens"] == 4
    assert c2["chunk_text"] == "just a few tokens"


def test_semdedup_drops_near_identical_keeps_first(spark):
    from mapreduce_rs_spark.operators.similarity import semdedup

    dim = 64
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.999] + [0.01] + [0.0] * (dim - 2)  # cos(e1,e2) ~ 0.99995
    e3 = [0.0] * (dim - 1) + [1.0]  # orthogonal to both
    rows = [(10, e1, 0), (20, e2, 0), (30, e3, 1)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = semdedup(df).collect()

    assert sum(r["n_vectors"] for r in out) == 3
    assert sum(r["n_dropped"] for r in out) == 1  # vec 20, the larger id
    assert sum(r["n_kept"] for r in out) == 2
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_vectors"]
        if r["n_dropped"]:
            # The near-identical pair shares one cluster: 2 in, 1 kept.
            assert r["n_vectors"] == 2 and r["drop_ratio"] == pytest.approx(0.5)


def test_dsir_weights_separate_target_like_from_alien_text(spark):
    """Intent test for DSIR: documents written in the target slice's
    vocabulary must score HIGHER than documents from a disjoint
    vocabulary, and a non-target doc written in target-like language
    must still be selected (that's importance resampling's whole point
    — it scores CONTENT, not the label)."""
    from mapreduce_rs_spark.operators.text_analysis import dsir_importance_weights

    target_text = "the cat sat on the mat and the dog ran to the cat"
    alien_text = "zq xv wk jj qq vv zz xx kk ww zq xv wk jj qq"
    rows = (
        # target slice: consistent English-like vocabulary
        [(i, target_text, "en", "wiki", len(target_text)) for i in range(10)]
        # non-target, same vocabulary: should be SELECTED anyway
        + [(100, target_text, "de", "web", len(target_text))]
        # non-target, alien vocabulary: should score clearly lower
        + [(200 + i, alien_text, "de", "web", len(alien_text)) for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r["doc_id"]: r for r in dsir_importance_weights(df).collect()}
    target_avg = sum(got[i]["avg_logw_cn"] for i in range(10)) / 10
    alien_avg = sum(got[200 + i]["avg_logw_cn"] for i in range(5)) / 5
    assert target_avg > alien_avg
    assert got[100]["selected"] == 1        # content wins over label
    assert got[100]["is_target"] == 0
    assert all(got[200 + i]["selected"] == 0 for i in range(5))


def test_entity_match_resolves_planted_typos_with_perfect_precision(spark, sf_dir):
    """Intent test for blocked ER: every resolved match must point at
    the dirty record's true source (the planted typo construction makes
    distance 1 to self, >= 2 to everyone else), and recall stays near
    total under the per-record rarest-K blocking (the fixed global df
    cutoff this replaced matched only 67% at sf0.1) — the only
    unmatched records are those whose every gram exceeds the df cap
    (all-common digit patterns), never a wrong match."""
    from mapreduce_rs_spark.operators.relational import entity_match_customers
    from mapreduce_rs_spark.sources.catalog import load_tables

    t = load_tables(spark, sf_dir)
    got = entity_match_customers(t).collect()
    assert got, "no matches resolved"
    for r in got:
        assert r["matched_custkey"] == r["dirty_id"] - 1_000_000
        assert r["edit_dist"] == 1
    n_dirty = t["customer"].where("c_custkey % 3 = 0").count()
    assert len(got) >= n_dirty * 0.98  # adaptive-blocking recall floor


def test_merge_upsert_reconciles_and_reprices(spark, sf_dir):
    """Intent test for the MERGE audit: inserted + updated + carried
    must reconcile to total rows; inserted count equals the planted
    insert batch; updated rows carry the repriced (+10%) totals —
    checked by recomputing the expected per-status totals directly."""
    from decimal import Decimal

    from mapreduce_rs_spark.operators.relational import orders_merge_upsert
    from mapreduce_rs_spark.sources.catalog import load_tables

    t = load_tables(spark, sf_dir)
    got = {r["status"]: r for r in orders_merge_upsert(t).collect()}
    orders = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
    exp: dict = {}
    for o in orders:
        price = Decimal(str(o["o_totalprice"]))
        if o["o_orderkey"] % 7 == 0:
            price = price * Decimal("1.10")
        st = exp.setdefault(o["o_orderstatus"], {"rows": 0, "total": Decimal(0), "ins": 0, "upd": 0})
        st["rows"] += 1
        st["total"] += price
        st["upd"] += 1 if o["o_orderkey"] % 7 == 0 else 0
        if o["o_orderkey"] % 97 == 0:  # cloned insert keeps the ORIGINAL price
            st["rows"] += 1
            st["total"] += Decimal(str(o["o_totalprice"]))
            st["ins"] += 1
    assert set(got) == set(exp)
    for status, e in exp.items():
        r = got[status]
        assert r["n_rows"] == e["rows"]
        assert r["n_inserted"] == e["ins"]
        assert r["n_updated"] == e["upd"]
        assert r["n_inserted"] + r["n_updated"] + r["n_carried"] == r["n_rows"]
        assert r["total_price"] == float(e["total"])


def test_bpe_batched_trainer_identical_to_sequential(spark, sf_dir):
    """The batched trainer (one pair-count job per ROUND, greedy
    symbol-disjoint prefix with the created-pair bound) must emit a
    byte-identical merge table to one-merge-per-job training — batch_k=1
    IS the sequential trainer — while actually batching (>1 merge per
    round) on real text."""
    from mapreduce_rs_spark.operators.text_analysis import _bpe_fit, _bpe_vocab
    from mapreduce_rs_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    vocab = _bpe_vocab(docs).localCheckpoint(eager=True)
    st_seq: dict = {}
    st_bat: dict = {}
    v_seq, seq = _bpe_fit(vocab, 12, batch_k=1, stats=st_seq)
    v_bat, bat = _bpe_fit(vocab, 12, batch_k=16, stats=st_bat)
    assert bat == seq
    assert len(bat) == 12
    # final vocabulary state (what the encoder consumes) matches too
    assert sorted(map(tuple, v_bat.select("word", "s").collect())) == sorted(
        map(tuple, v_seq.select("word", "s").collect())
    )
    # and the batching is real: strictly fewer pair-count rounds than
    # merges (the sequential trainer pays one per merge)
    assert st_seq["rounds"] == 12
    assert st_bat["rounds"] < 12


@pytest.mark.parametrize(
    "words",
    [
        # overlap guard: (x,a) ties (a,b); merging (a,b) creates (x,ab)
        # with the full count 40, which must win round 2 sequentially —
        # a naive batcher would merge the disjoint decoy (c,d) first.
        ["xab"] * 40 + ["cd"] * 30,
        # created-pair tie: after (a,b), (x,ab) at 39 ties (c,d) at 39 —
        # the strict bound stops the batch so round 2's argmax runs on
        # real counts (tie-break "c d" < "x ab" picks (c,d)).
        ["xab"] * 39 + ["ab"] + ["cd"] * 39,
        # cascading composition: each merge enables the next, so every
        # round can safely accept only what the guards allow.
        ["aaaa"] * 20 + ["aab"] * 15 + ["ba"] * 10,
        # fully disjoint high-count pairs: the batch SHOULD take several
        # merges in one round and still match.
        ["ab"] * 50 + ["cd"] * 40 + ["ef"] * 30 + ["gh"] * 20,
    ],
)
def test_bpe_batched_guards_adversarial(spark, words):
    """Adversarial fixtures for the batched trainer's two guards
    (symbol overlap, created-pair bound): batched must stay
    byte-identical to sequential on corpora engineered to punish
    over-eager batching."""
    from mapreduce_rs_spark.operators.text_analysis import _bpe_fit, _bpe_vocab

    rows = [(1, " ".join(words), "en", "s", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    vocab = _bpe_vocab(df).localCheckpoint(eager=True)
    _, seq = _bpe_fit(vocab, 5, batch_k=1)
    _, bat = _bpe_fit(vocab, 5, batch_k=16)
    assert bat == seq


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_bpe_batched_identical_on_random_corpora(spark, seed):
    """Randomized identity sweep: small alphabets force exact count
    ties and merge cascades (the cases the guards exist for); the
    batched trainer must match sequential byte-for-byte on every
    corpus. Fixed seeds — reproducible, and 5 corpora x 8 merges keeps
    the Spark job count CI-sized."""
    import random

    from mapreduce_rs_spark.operators.text_analysis import _bpe_fit, _bpe_vocab

    rng = random.Random(seed)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(rng.randint(30, 80))
    ]
    rows = [(1, " ".join(words), "en", "s", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    vocab = _bpe_vocab(df).localCheckpoint(eager=True)
    _, seq = _bpe_fit(vocab, 8, batch_k=1)
    _, bat = _bpe_fit(vocab, 8, batch_k=16)
    assert bat == seq


def test_bpe_train_merges_matches_pure_python_bpe(spark):
    """The double-space replace scheme must implement EXACT BPE merge
    semantics (left-to-right non-overlapping, merged symbols compose in
    later rounds). Verified against a transparent pure-Python BPE
    trainer on a fixture where round 2 merges a MULTI-char symbol."""
    import collections

    from mapreduce_rs_spark.operators.text_analysis import (
        bpe_encode_stats,
        bpe_train_merges,
    )

    rows = [
        (1, "banana bandana banana", "en", "s", 0),
        (2, "ana banana nab aaa", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = [
        (r["merge_round"], r["pair"], r["cnt"])
        for r in bpe_train_merges(df, n_merges=4).collect()
    ]
    enc = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in bpe_encode_stats(df, n_merges=4).collect()
    }

    vocab = collections.Counter()
    for _, text, *_ in rows:
        for w in text.split():
            vocab[tuple(w)] += 1
    expected = []
    for rnd in range(1, 5):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], " ".join(kv[0])))
        expected.append((rnd, f"{a} {b}", cnt))
        new: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        vocab = new
    assert got == expected
    # the fixture must actually exercise multi-char composition
    assert any(len(p.replace(" ", "")) > 2 for _, p, _ in expected)

    # The ENCODER must apply those same merges in rank order: per-doc
    # token counts equal a transparent pure-Python merge-by-merge encode.
    def py_encode(word):
        syms = list(word)
        for _, pair, _ in expected:
            a, b = pair.split(" ")
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    exp_enc = {}
    for doc_id, text, *_ in rows:
        words = text.split()
        exp_enc[doc_id] = (
            len(words),
            sum(len(py_encode(w)) for w in words),
            sum(len(w) for w in words),
        )
    assert enc == exp_enc


def test_incremental_ingest_neardup_classifies_planted_cases(spark):
    """Intent test for the near-dup admission cascade: a hand-built
    corpus where every rejection tier has exactly one known member.
    ids are chosen against the operator's own %10 split and %20 plant
    rules — 20 spawns a near-plant of a CORPUS doc, 29 a near-plant of
    a BATCH doc, 25 an exact plant of a corpus doc, 39 an exact plant
    of a batch doc, and 18 is plain novel batch content."""
    from mapreduce_rs_spark.operators.dedup import incremental_ingest_neardup

    def words(seed: str, n: int = 30) -> str:
        return " ".join(f"{seed}{i} common{i % 5}" for i in range(n))

    rows = [
        (1, "en", words("alpha")),    # corpus filler
        (2, "en", words("bravo")),    # corpus filler
        (3, "en", words("charlie")),  # corpus filler
        (20, "en", words("delta")),   # corpus; spawns NEAR plant 1000020
        (25, "en", words("echo")),    # corpus; spawns EXACT plant 1000025
        (18, "en", words("foxtrot")), # batch; novel -> admitted
        (29, "en", words("golf")),    # batch; spawns NEAR plant 1000029
        (39, "en", words("hotel")),   # batch; spawns EXACT plant 1000039
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    (out,) = incremental_ingest_neardup(df).collect()

    # batch = {18, 29, 39} natural + 4 plants
    assert out["n_batch"] == 7
    assert out["n_exact_vs_corpus"] == 1   # 1000025 (copy of corpus 25)
    assert out["n_exact_in_batch"] == 1    # 1000039 (copy of batch 39)
    assert out["n_near_vs_corpus"] == 1    # 1000020 (~corpus 20)
    assert out["n_near_in_batch"] == 1     # 1000029 (~batch survivor 29)
    assert out["n_admitted"] == 3          # 18, 29, 39


def test_ivf_maintenance_branches_and_identities(spark, sf_dir):
    """Both refit branches must be live at the test SF (a threshold
    that never fires tests nothing), and the per-list report must be
    internally consistent."""
    from mapreduce_rs_spark.operators.similarity import (
        IVF_REFIT_GROWTH,
        ivf_index_maintenance,
    )
    from mapreduce_rs_spark.sources.catalog import load_table

    rows = ivf_index_maintenance(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    num, den = IVF_REFIT_GROWTH
    assert any(r["refit_needed"] for r in rows)
    assert any(not r["refit_needed"] for r in rows)
    for r in rows:
        assert r["n_after"] == r["n_before"] + r["n_new"]
        assert r["refit_needed"] == (r["n_new"] * den >= r["n_before"] * num)
        if r["n_before"] > 0:
            assert r["growth_bp"] == (r["n_new"] * 10000) // r["n_before"]
        assert -1.0 - 1e-9 <= r["drift_cos"] <= 1.0 + 1e-9


def test_knn_graph_ingest_branches_and_identities(spark, sf_dir):
    """The graph tier's maintenance loop: both rebuild branches live at
    the test SF (the ivf_index_maintenance discipline), the cumulative
    growth ledger consistent, admission bounded by k edges per vector,
    and the capped eval non-vacuous."""
    from mapreduce_rs_spark.operators.similarity import (
        GRAPH_REBUILD_GROWTH,
        N_QUERIES_CAP,
        NND_K,
        knn_graph_ingest,
    )
    from mapreduce_rs_spark.sources.catalog import load_table

    rows = sorted(
        knn_graph_ingest(load_table(spark, sf_dir, "embeddings")).collect(),
        key=lambda r: r["batch_id"],
    )
    num, den = GRAPH_REBUILD_GROWTH
    assert any(r["rebuild_needed"] for r in rows)
    assert any(not r["rebuild_needed"] for r in rows)
    cum = 0
    for r in rows:
        cum += r["n_vectors"]
        assert r["n_edges"] <= r["n_vectors"] * NND_K
        assert r["n_edges"] > 0  # every vector finds SOME standing edge
        assert r["n_rev_improved"] <= r["n_edges"]
        if r["n_eval"] > 0:
            assert 0 <= r["recall_bp"] <= 10000
        else:
            assert r["recall_bp"] is None
    total_new = sum(r["n_vectors"] for r in rows)
    # the %10 split puts ~20% in the new side -> ~25% growth overall
    assert 2000 <= rows[-1]["cum_growth_bp"] <= 3000
    assert sum(r["n_eval"] for r in rows) == min(N_QUERIES_CAP, total_new)
    running = 0
    for r in rows:
        running += r["n_vectors"]
        prev = rows[rows.index(r) - 1]["cum_growth_bp"] if rows.index(r) else 0
        assert r["cum_growth_bp"] >= prev  # monotone ledger


def test_lsh_scurve_endpoints(spark, sf_dir):
    """The S-curve's deterministic endpoints: the p=4 variant is a
    verbatim copy (identical signature -> every band collides ->
    decile 10 rate must be exactly 1.0), and the p=0 variant shares no
    content (decile 0 collisions are random 32-bit band-key matches —
    the rate must sit near 0). The transition region must be populated
    (some decile strictly between the endpoints has pairs)."""
    from mapreduce_rs_spark.operators.dedup import lsh_scurve_calibration
    from mapreduce_rs_spark.sources.catalog import load_table

    rows = {
        r["sim_decile"]: r
        for r in lsh_scurve_calibration(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert rows[10]["collision_rate"] == 1.0
    assert rows[0]["collision_rate"] < 0.2
    assert any(0 < d < 10 for d in rows)
