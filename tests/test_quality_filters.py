"""Behavior tests for the corpus-hygiene operators on crafted inputs
the synthetic corpus doesn't exercise (short docs, actual repetition,
planted PII).  Oracle parity at sf0.001 is covered by
tests/test_oracle_parity.py via the registry."""

from __future__ import annotations

from grpc_map_reduce_spark.operators.quality_filters import (
    redact_pii,
    repetition_stats,
)


def _stats(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}


def test_repetition_stats_spam_doc_dropped(spark):
    out = _stats(spark, ["buy now " * 50, "the quick brown fox jumps over the lazy dog"])
    spam, clean = out[0], out[1]
    # "buy now" repeated: every word is one of two values, every
    # 2-gram/3-gram occurrence is a repeat.
    assert spam["n_words"] == 100 and spam["uniq_words"] == 2
    assert spam["top_word_bp"] == 5000
    assert spam["dup_word_bp"] == 9800
    assert spam["dup_2gram_bp"] == 10000
    assert spam["dup_3gram_bp"] == 10000
    assert spam["keep"] is False
    # 9 words, only "the" repeats: top_word_bp = 2*10000 DIV 9 = 2222,
    # over the 20% line but under the 20-word floor -> rule not applied.
    assert clean["dup_2gram_bp"] == 0 and clean["dup_3gram_bp"] == 0
    assert clean["top_word_bp"] == 2222 and clean["keep"] is True


def test_repetition_stats_short_docs(spark):
    out = _stats(spark, ["single", "two words", "all distinct words here"])
    one = out[0]
    assert one["n_words"] == 1 and one["dup_2gram_bp"] == 0
    assert one["keep"] is True  # under the length floor, nothing repeats
    two = out[1]
    assert two["n_words"] == 2 and two["dup_3gram_bp"] == 0
    assert two["keep"] is True
    assert out[2]["dup_word_bp"] == 0 and out[2]["keep"] is True


def test_repetition_stats_empty_doc_excluded(spark):
    # A doc with no letters tokenizes to zero words -> no grams -> no
    # output row (same as the oracle, which never produces a group).
    out = _stats(spark, ["123 456", "real words"])
    assert set(out) == {1}


def test_redact_pii_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@corp.example.org now"),
            (2, "server at 192.168.1.254 port"),
            (3, "call 555-0199 twice: 555-0200"),
            (4, "nothing sensitive here"),
        ],
        "id long, t string",
    )
    rows = {r["id"]: r.asDict() for r in redact_pii(df, "t").collect()}
    assert rows[1]["masked"] == "mail <EMAIL> now" and rows[1]["n_emails"] == 1
    assert rows[2]["masked"] == "server at <IP> port" and rows[2]["n_ips"] == 1
    assert rows[3]["masked"] == "call <PHONE> twice: <PHONE>"
    assert rows[3]["n_phones"] == 2
    assert rows[4]["masked"] == "nothing sensitive here"
    assert rows[4]["n_emails"] == rows[4]["n_ips"] == rows[4]["n_phones"] == 0


def test_compression_signal_matches_zlib(spark, sf_dir):
    import zlib

    from grpc_map_reduce_spark.operators.quality_filters import (
        COMPRESSION_LEVEL,
        compression_signal,
    )
    from grpc_map_reduce_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r for r in compression_signal(docs).collect()}
    assert set(got) == set(texts)
    for d, t in texts.items():
        raw = len(t.encode())
        comp = len(zlib.compress(t.encode(), COMPRESSION_LEVEL))
        r = got[d]
        assert (r["raw_bytes"], r["deflate_bytes"]) == (raw, comp)
        assert r["ratio_bp"] == comp * 10000 // raw
        assert r["keep"] == (r["ratio_bp"] >= 2500)
    # word-soup fixture text is repetitive but not degenerate; tiny
    # docs can exceed 100% (DEFLATE framing overhead), which is itself
    # a valid "too short to judge" signal
    ratios = [r["ratio_bp"] for r in got.values()]
    assert min(ratios) > 0 and max(ratios) < 20000


def test_winsorize_exact_discrete_percentiles(spark):
    import pandas as pd

    from grpc_map_reduce_spark.operators.quality_filters import (
        winsorized_length_stats,
    )

    # 100 docs, lengths 1..100: ceil(0.05*100)=5 -> p05=5; ceil(95)=95
    pdf = pd.DataFrame({
        "doc_id": range(100),
        "source": ["s"] * 100,
        "n_chars": range(1, 101),
    })
    out = winsorized_length_stats(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.p05_len, r.p95_len) == (5, 95)
    assert r.n_clipped_low == 4 and r.n_clipped_high == 5
    w = [min(max(x, 5), 95) for x in range(1, 101)]
    assert r.winsor_mean_len_x100 == sum(w) * 100 // 100


def test_bigram_nll_matches_pure_python(spark):
    """Reconstruct the interpolated bigram LM in plain Python over a
    tiny corpus and compare NLLs exactly (same rounding)."""
    import math

    import pandas as pd

    from grpc_map_reduce_spark.operators.quality_filters import (
        LM_LAMBDA_X10,
        LM_SMOOTH_K,
        bigram_nll,
    )
    from grpc_map_reduce_spark.operators.sketches import SPLIT_TRAIN_PCT

    texts = ["the cat sat on the mat", "the cat ran", "a dog sat",
             "the mat sat on a cat", "dog ran fast"]
    pdf = pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    got = {r.doc_id: (r.n_bigrams, r.n_unseen_bigrams, r.mean_nll)
           for r in bigram_nll(spark.createDataFrame(pdf)).collect()}

    import hashlib

    def in_train(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return h % 100 < SPLIT_TRAIN_PCT

    lam = LM_LAMBDA_X10 / 10.0
    toks = {i: t.split() for i, t in enumerate(texts)}
    tr = [i for i in toks if in_train(i)]
    uni, ctx, bi = {}, {}, {}
    for i in tr:
        for w in toks[i]:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks[i], toks[i][1:]):
            ctx[a] = ctx.get(a, 0) + 1
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total, vsize = sum(uni.values()), len(uni)
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert i not in got
            continue
        nlls = []
        unseen = 0
        for a, b in pairs:
            if (a, b) not in bi:
                unseen += 1
            p_bi = (bi.get((a, b), 0) + LM_SMOOTH_K) / (
                ctx.get(a, 0) + LM_SMOOTH_K * vsize)
            p_uni = (uni.get(b, 0) + LM_SMOOTH_K) / (
                total + LM_SMOOTH_K * vsize)
            nlls.append(-math.log(lam * p_bi + (1 - lam) * p_uni))
        want = (len(pairs), unseen, round(sum(nlls) / len(nlls), 6))
        assert got[i][:2] == want[:2], (i, got[i], want)
        assert abs(got[i][2] - want[2]) <= 1e-6, (i, got[i], want)


def test_compression_signal_checked_invariants_hold(spark, sf_dir, duck):
    """The structure-gated driver twin (VERDICT r9 item 5): every
    RFC-1950/1951 invariant column must be TRUE for every fixture doc
    and the frame must hash-match its TRUE-constant oracle."""
    from conftest import assert_matches_oracle

    from grpc_map_reduce_spark.operators.quality_filters import (
        compression_signal_checked,
    )
    from grpc_map_reduce_spark.sources.tables import table

    rows = compression_signal_checked(
        table(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        assert r["deflate_in_bounds"], r
        assert r["concat_monotone"], r
        assert r["keep_consistent"], r
    assert_matches_oracle(spark, duck, sf_dir, "docs_compression_signal")
