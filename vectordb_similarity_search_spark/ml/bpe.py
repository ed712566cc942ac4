"""Byte-pair-encoding tokenizer training over a Spark corpus.

The training-data pipeline's missing half of tokenization: the catalog
already COUNTS tokens (plans/text_queries: whitespace + BPE-ish regex);
this module LEARNS the merge table (Sennrich et al. 2016, public
algorithm) with the standard scale split:

- the corpus-scale step — word frequencies — is ONE distributed
  aggregate (explode → groupBy → count), the only pass that touches the
  100 TB side;
- the vocabulary work — the iterative most-frequent-pair merge loop —
  runs driver-side over the BOUNDED word-frequency table, exactly like
  production trainers (HF tokenizers train from word counts, not from
  raw text), and like ml/pca.py's moments→driver-eigh split. Cost is
  O(n_merges × distinct words), independent of corpus size.

``top_words`` caps the table the driver holds (default 200k): rare-word
tails contribute negligible pair mass, and the cap is what makes the
collect a bounded model-build step instead of a data collect. Ties in
pair frequency break lexicographically so the learned merges are a pure
content function of the corpus (fixture-stable across sessions).

Encoding applies the learned merges per word — an Arrow-batched
mapInPandas (never a row-at-a-time UDF), with the merge table riding the
closure as a broadcast-sized list.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def _word_counts(docs: DataFrame, text_col: str, top_words: int) -> list:
    wf = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        # deterministic cap: ties on count break on the word itself
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(top_words)
    )
    return [(r["w"], r["n"]) for r in wf.collect()]


def _merge_loop(
    counts: list, n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Classic BPE over {symbol-sequence: freq}: repeatedly merge the
    most frequent adjacent pair. Deterministic: ties break on the pair
    itself."""
    words = {tuple(w) + (_EOW,): n for w, n in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        ab = a + b
        new_words = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


@dataclass(frozen=True)
class BpeModel:
    merges: tuple  # tuple[tuple[str, str], ...] in learned order

    def encode_word(self, word: str) -> list[str]:
        sym = list(word) + [_EOW]
        for a, b in self.merges:
            i, out = 0, []
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
            if len(sym) == 1:
                break
        return sym

    def encode(
        self, docs: DataFrame, text_col: str, out_col: str = "tokens"
    ) -> DataFrame:
        """Tokenize a text column into learned subword units — Arrow
        batches, merge table shipped once per executor in the closure."""
        import pandas as pd

        merges = self.merges
        schema = T.StructType(
            list(docs.schema.fields)
            + [T.StructField(out_col, T.ArrayType(T.StringType()))]
        )

        def run(batches):
            import re

            model = BpeModel(merges)
            cache: dict[str, list[str]] = {}

            def enc(text: str) -> list[str]:
                out: list[str] = []
                for w in re.split(r"[^a-z0-9]+", (text or "").lower()):
                    if not w:
                        continue
                    toks = cache.get(w)
                    if toks is None:
                        toks = cache[w] = model.encode_word(w)
                    out.extend(toks)
                return out

            for pdf in batches:
                if pdf.empty:
                    continue
                out = pdf.copy()
                out[out_col] = [enc(t) for t in pdf[text_col]]
                yield out

        return docs.mapInPandas(run, schema)


def fit_bpe(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 200,
    top_words: int = 200_000,
    min_pair_count: int = 2,
) -> BpeModel:
    """Learn a BPE merge table from a corpus: one distributed word-count
    aggregate, then the driver-side merge loop (see module docstring for
    the scale argument). Deterministic for a fixed corpus."""
    counts = _word_counts(docs, text_col, top_words)
    return BpeModel(tuple(_merge_loop(counts, n_merges, min_pair_count)))
