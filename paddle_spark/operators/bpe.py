"""Byte-pair-encoding tokenizer — distributed training and encoding.

The LLM-training pipeline's last mile: `textstats.bpe_token_count_col`
approximates token budgets with a regex; this module implements the real
thing (Sennrich et al. 2016, the public BPE algorithm used by GPT-2-family
vocabularies) as a Spark-shaped two-phase job:

  * TRAIN (`train_bpe`): the corpus collapses to a word-frequency table
    with ONE explode -> groupBy shuffle (map-side partial agg absorbs
    token skew; output is vocabulary-bounded, not corpus-bounded). The
    top-`max_words` rows — a few hundred thousand at most, the same
    bounded-driver-state discipline as the IVF centroid table — come to
    the driver, where the classic merge loop runs over (word, count)
    pairs. Corpus size changes the COUNTS, not the table size: training
    cost is independent of 10^12-document scale.
  * ENCODE (`bpe_encode`): merges ride to executors in the task closure
    (a list of string pairs — broadcast-sized by construction); encoding
    is an Arrow-batched mapInPandas with a per-batch word->tokens memo
    (real corpora repeat words heavily), map-only, zero shuffles.

Determinism: the merge loop breaks count ties by lexicographic pair
order, so any faithful replay (and any partitioning of the count table)
produces the identical merge sequence; the encoder's greedy
lowest-rank-first loop is the standard deterministic BPE apply.

Reference parity note: the reference repo (xynehq/paddle) is an OCR
pipeline with no tokenizer; this operator belongs to the task-mandated
training-data family (sequence packing in operators/sampling.py consumes
exactly these token counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from paddle_spark.operators.dedup import words_col

EOW = "</w>"  # end-of-word marker (Sennrich convention)


def word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int = 200_000
) -> DataFrame:
    """(word, n) frequency table, one corpus shuffle, vocabulary-bounded.
    ``max_words`` caps the driver-bound table at the most frequent words
    (standard practice — rare-word tails contribute ~nothing to merge
    counts); ordering (n DESC, word) keeps the cut deterministic."""
    return (
        docs.select(F.explode(words_col(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_words)
    )


def train_merges(counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """The classic BPE merge loop over a word-frequency dict (driver-side;
    the dict is vocabulary-bounded). Ties break to the lexicographically
    smallest pair, making the sequence fully deterministic."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): c for w, c in counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing repeats: further merges are memorization
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """One corpus shuffle + bounded driver merge loop -> merge list."""
    wc = {r["word"]: r["n"] for r in word_counts(docs, text_col, max_words).collect()}
    return train_merges(wc, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE apply (the standard deterministic
    encoder): repeatedly merge the best-ranked adjacent pair."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    with_tokens: bool = False,
) -> DataFrame:
    """Tokenize every document under a trained merge table.

    Output: (id, n_words, n_tokens[, tokens]) — map-only Arrow-batched
    mapInPandas; the merge table travels in the task closure. A per-batch
    word->tokens memo makes the cost ~(distinct words per batch), not
    (total words)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    src = docs.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
    )

    def batch(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["id"], pdf["text"]):
                ws = (text or "").lower().split()
                toks: list[str] = []
                for w in ws:
                    t = memo.get(w)
                    if t is None:
                        t = encode_word(w, ranks)
                        memo[w] = t
                    toks.extend(t)
                row = (int(did), len(ws), len(toks))
                if with_tokens:
                    row += (toks,)
                rows.append(row)
            cols = ["id", "n_words", "n_tokens"] + (
                ["tokens"] if with_tokens else []
            )
            yield pd.DataFrame(rows, columns=cols)

    schema = "id long, n_words long, n_tokens long" + (
        ", tokens array<string>" if with_tokens else ""
    )
    return src.mapInPandas(batch, schema=schema)


def detokenize(tokens: list[str]) -> str:
    """Inverse of encode over a whole document's token stream: merge
    symbols, turn each end-of-word marker into a single space."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")
