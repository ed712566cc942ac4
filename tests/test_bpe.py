"""BPE trainer: merge-table correctness, determinism, encode properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_similarity_search_spark.ml.bpe import BpeModel, fit_bpe
from vectordb_similarity_search_spark.sources.tables import load_table


def _pure_python_bpe(word_counts, n_merges):
    """Independent reference implementation (no shared code paths with
    the module's _merge_loop beyond the algorithm itself)."""
    words = {tuple(w) + ("</w>",): n for w, n in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        merges.append(best[0])
        a, b = best[0]
        nw = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (a, b):
                    out.append(a + b); i += 2
                else:
                    out.append(sym[i]); i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + n
        words = nw
    return merges


def test_fit_matches_reference_on_known_corpus(spark):
    rows = [(i, "low lower lowest newer newest wide wider widest") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    model = fit_bpe(docs, "text", n_merges=30)
    counts = [
        ("low", 5), ("lower", 5), ("lowest", 5), ("newer", 5),
        ("newest", 5), ("wide", 5), ("wider", 5), ("widest", 5),
    ]
    want = _pure_python_bpe(sorted(counts, key=lambda kv: (-kv[1], kv[0])), 30)
    assert list(model.merges) == want
    # shared suffixes become units: 'er</w>' and 'est</w>' paths exist
    joined = {a + b for a, b in model.merges}
    assert any(u.endswith("er</w>") for u in joined)
    assert any(u.endswith("est</w>") for u in joined)


def test_fit_deterministic_across_layouts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = fit_bpe(docs, "text", n_merges=40, top_words=5000)
    b = fit_bpe(docs.repartition(13), "text", n_merges=40, top_words=5000)
    assert a.merges == b.merges and len(a.merges) == 40


def test_encode_compresses_and_roundtrips(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    model = fit_bpe(docs, "text", n_merges=60, top_words=5000)
    enc = model.encode(docs, "text")
    row = enc.select(
        F.size("tokens").alias("n_bpe"),
        F.size(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("n_words"),
        F.length("text").alias("n_chars"),
    ).agg(
        F.sum("n_bpe").alias("bpe"),
        F.sum("n_words").alias("words"),
        F.sum("n_chars").alias("chars"),
    ).head()
    # merges compress: fewer units than characters, more than words
    assert row["words"] < row["bpe"] < row["chars"]
    # concatenating a word's tokens (minus the end marker) restores it
    sample = enc.select("text", "tokens").head()
    rebuilt = "".join(sample["tokens"]).replace("</w>", " ").strip()
    import re

    words = " ".join(w for w in re.split(r"[^a-z0-9]+", sample["text"].lower()) if w)
    assert rebuilt == words


def test_encode_word_applies_merges_in_order():
    model = BpeModel((("l", "o"), ("lo", "w"), ("low", "</w>")))
    assert model.encode_word("low") == ["low</w>"]
    assert model.encode_word("lot") == ["lo", "t", "</w>"]
