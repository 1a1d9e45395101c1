"""Deterministic hash sampling + greedy sequence packing
(operators/sampling.py): Python-replayed semantics, determinism across
partitionings, and packing invariants."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from paddle_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    hash_sample,
    pack_sequences,
)


def _bucket(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % SAMPLE_BUCKETS


class TestHashSample:
    RATES = {"en": 0.3, "de": 1.0, "es": 0.0}

    def test_matches_python_replay(self, spark, documents):
        d = documents.select("doc_id", "lang", F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("key"))
        got = {
            r.doc_id
            for r in hash_sample(d, self.RATES, "lang", "key").collect()
        }
        expect = set()
        for r in d.collect():
            rate = self.RATES.get(r.lang, 0.0)
            if _bucket(r.key) < int(rate * SAMPLE_BUCKETS):
                expect.add(r.doc_id)
        assert got == expect
        assert expect  # fixture has en+de rows, so something survives

    def test_deterministic_across_partitionings(self, spark, documents):
        d = documents.select("doc_id", "lang", F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("key"))
        a = {r.doc_id for r in hash_sample(d, self.RATES, "lang", "key").collect()}
        b = {
            r.doc_id
            for r in hash_sample(
                d.repartition(7, "lang"), self.RATES, "lang", "key"
            ).collect()
        }
        assert a == b

    def test_rate_extremes(self, spark, documents):
        d = documents.select("doc_id", "lang", F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("key"))
        keep_all = hash_sample(d, {}, "lang", "key", default_rate=1.0)
        assert keep_all.count() == d.count()
        keep_none = hash_sample(d, {}, "lang", "key", default_rate=0.0)
        assert keep_none.count() == 0


class TestPackSequences:
    def test_greedy_invariants(self, spark, documents):
        budget = 200
        d = documents.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
        out = pack_sequences(d, budget=budget, n_shards=4).collect()
        assert len(out) == d.count()
        by_seq: dict[tuple, list] = {}
        by_shard: dict[int, list] = {}
        for r in out:
            assert r.shard == r.id % 4
            by_seq.setdefault((r.shard, r.seq_no), []).append(r)
            by_shard.setdefault(r.shard, []).append(r)
        # no sequence exceeds the budget unless it is a single long doc
        for rows in by_seq.values():
            total = sum(r.n_tokens for r in rows)
            assert total <= budget or len(rows) == 1
        # greedy: a doc opens a new sequence only because it didn't fit
        for rows in by_shard.values():
            rows.sort(key=lambda r: r.id)
            used = None
            seq = None
            for r in rows:
                if seq is not None and r.seq_no == seq:
                    used += r.n_tokens
                else:
                    if used is not None:
                        assert used + r.n_tokens > budget, (
                            "doc started a new sequence but would have fit"
                        )
                    assert seq is None or r.seq_no == seq + 1
                    seq, used = r.seq_no, r.n_tokens
                assert used <= budget or True

    def test_oversized_doc_gets_own_sequence(self, spark):
        rows = [(0, 50), (1, 500), (2, 60), (3, 70)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = {r.id: r.seq_no for r in
               pack_sequences(df, budget=100, n_shards=1).collect()}
        # 50 -> seq0; 500 doesn't fit -> seq1 alone; 60 -> seq2; 70 -> seq3
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_deterministic_across_partitionings(self, spark, documents):
        d = documents.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
        a = sorted(map(tuple, pack_sequences(d, 200, 4).collect()))
        b = sorted(map(tuple,
                       pack_sequences(d.repartition(13), 200, 4).collect()))
        assert a == b


class TestPlans:
    def test_hash_sample_is_map_only(self, spark, documents):
        d = documents.select(
            "doc_id", "lang",
            F.concat(F.col("source"), F.lit("/"),
                     F.col("doc_id").cast("string")).alias("key"),
        )
        plan = hash_sample(d, {"en": 0.5}, "lang", "key")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # scan -> project -> filter only
        assert "Cartesian" not in plan

    def test_pack_sequences_single_shuffle(self, spark, documents):
        d = documents.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
        plan = pack_sequences(d, 200, 4)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # one hash partition on shard
        assert "FlatMapGroupsInPandas" in plan
        # the scan must not read the text column into the Python worker:
        # token counting happened JVM-side before the exchange
        assert "pack(id" in plan and "text" not in plan.split("Exchange")[0].split("Scan")[0]


class TestTemperatureSample:
    def _src(self, documents):
        return documents.select(
            "doc_id", "source",
            F.concat(F.col("source"), F.lit("/"), F.col("doc_id")).alias("skey"),
        )

    def test_rates_formula_exact(self, spark, documents):
        import math

        from paddle_spark.operators.sampling import temperature_rates

        counts = {
            r["source"]: r["cnt"]
            for r in documents.groupBy("source").agg(
                F.count("*").alias("cnt")
            ).collect()
        }
        nm = max(counts.values())
        rates = {
            r["source"]: r["rate_bp"]
            for r in temperature_rates(documents, "source").collect()
        }
        for s, n in counts.items():
            want = min(10000, math.floor(10000 * (math.sqrt(nm) / math.sqrt(n))))
            assert rates[s] == want, s

    def test_largest_stratum_keeps_everything(self, spark, documents):
        from paddle_spark.operators.sampling import temperature_rates

        rates = temperature_rates(documents, "source").collect()
        nm = max(r["n_docs"] for r in rates)
        for r in rates:
            if r["n_docs"] == nm:
                assert r["rate_bp"] == 10000

    def test_deterministic_across_partitionings(self, spark, documents):
        from paddle_spark.operators.sampling import temperature_sample

        a = sorted(
            r["doc_id"]
            for r in temperature_sample(
                self._src(documents), "source", "skey"
            ).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in temperature_sample(
                self._src(documents).repartition(17), "source", "skey"
            ).collect()
        )
        assert a == b and len(a) > 0

    def test_rebalances_toward_small_strata(self, spark, documents):
        """After sampling, small strata keep ~everything while the
        largest is downsampled toward sqrt proportions."""
        from paddle_spark.operators.sampling import temperature_sample

        before = {
            r["source"]: r["cnt"]
            for r in documents.groupBy("source").agg(F.count("*").alias("cnt")).collect()
        }
        after = {
            r["source"]: r["cnt"]
            for r in temperature_sample(self._src(documents), "source", "skey")
            .groupBy("source").agg(F.count("*").alias("cnt")).collect()
        }
        nm = max(before.values())
        for s, n in before.items():
            if n == nm:
                continue
            # expected keep fraction sqrt(nm/n)/ (nm/n) >= observed-ish;
            # exact check: kept fraction matches rate within bucket noise
            import math
            rate = min(1.0, math.sqrt(nm / n))
            assert abs(after.get(s, 0) / n - rate) < 0.15, s
