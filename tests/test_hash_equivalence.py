"""Production-hash ⇄ portable-hash equivalence (VERDICT r3 item 4).

q30/q31/q33 run the near-dup pipelines with the md5-based portable hash
so DuckDB can replay them exactly; q53-q55 run the xxhash64 production
defaults, which have no cross-engine twin. These tests extend the
oracle's reach to the production path by asserting, on the same
deterministic testdata:

- MinHash+LSH: the emitted PAIR SET is identical under both hash
  families (the pairs are real near-dups far above the 0.7 threshold,
  so the 128-perm estimate classifies them identically regardless of
  which 2-universal base hash feeds the permutations).
- SimHash: cross-hash pair equality is NOT the contract (Hamming
  distance between fingerprints is hash-dependent by construction), so
  each family is instead checked against its own brute-force ground
  truth: blocking + popcount verify must equal the all-pairs
  Hamming <= max_hamming set computed driver-side from the very same
  fingerprints. That proves the pigeonhole blocking loses nothing and
  the verify math is exact — for the production path specifically.
- Winnowing: fingerprint VALUES and per-doc distinct counts are
  hash-dependent; the hash-agnostic invariants are (a) which docs have
  an empty fingerprint set (purely a length property) and (b) the
  Schleimer guarantee — docs sharing a substring of length >= k+w-1
  share a fingerprint — which test_pipeline_ops already pins on the
  production default; here we pin the empty-set parity across families.

Reference: recap-worker/src/pipeline/minhash.rs:83-180 — the production
path is the one the reference actually runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.functions import text_analysis as ta
from alt_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_minhash_pair_set_identical_across_hash_families(spark):
    docs = _docs(spark)
    portable = {
        (r.id1, r.id2)
        for r in dedup.minhash_near_dup(docs, threshold=0.7, portable=True).collect()
    }
    production = {
        (r.id1, r.id2)
        for r in dedup.minhash_near_dup(docs, threshold=0.7, portable=False).collect()
    }
    assert portable, "testdata must contain near-duplicate documents"
    assert production == portable


def _brute_force_hamming_pairs(spark, docs, portable, max_hamming=3):
    bits = dedup.simhash_bits(docs, portable=portable)
    rows = bits.collect()  # 500 docs at sf0.001 — bounded test-only scan
    fp = {r.id: r.simhash for r in rows}
    ids = sorted(fp)
    return {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1") <= max_hamming
    }


def test_simhash_production_blocking_equals_brute_force(spark):
    docs = _docs(spark)
    got = {
        (r.id1, r.id2) for r in dedup.simhash_near_dup(docs, portable=False).collect()
    }
    want = _brute_force_hamming_pairs(spark, docs, portable=False)
    assert want, "testdata must contain simhash near-dups"
    assert got == want


def test_simhash_portable_blocking_equals_brute_force(spark):
    docs = _docs(spark)
    got = {
        (r.id1, r.id2) for r in dedup.simhash_near_dup(docs, portable=True).collect()
    }
    want = _brute_force_hamming_pairs(spark, docs, portable=True)
    assert got == want


def test_winnowing_empty_set_parity_across_hash_families(spark):
    docs = _docs(spark)
    empty_portable = {
        r.id
        for r in ta.winnowing_fingerprints(docs, portable=True).collect()
        if not r.fingerprints
    }
    empty_production = {
        r.id
        for r in ta.winnowing_fingerprints(docs, portable=False).collect()
        if not r.fingerprints
    }
    assert empty_production == empty_portable
    # Both families fingerprint every doc long enough for one window.
    long_docs = {
        r.doc_id for r in docs.filter(F.length("text") >= 5 + 4 - 1).collect()
    }
    assert not (empty_production & long_docs)


def test_winnowing_portable_hex_is_order_isomorphic_to_long(spark):
    """The portable_hex representation (r12 optimization: the raw
    15-hex-char md5 prefix instead of the conv-parsed long) must be a
    strict order-isomorphism of the numeric form: fixed-width lowercase
    hex sorts exactly like the 60-bit value it encodes, so the sliding
    minima pick the SAME grams and the per-doc distinct fingerprint
    SETS correspond 1:1 — pinned by re-parsing the hex values to longs
    and comparing whole sets per doc, not just counts."""
    docs = _docs(spark)
    long_fp = {
        r.id: sorted(r.fingerprints)
        for r in ta.winnowing_fingerprints(docs, portable=True).collect()
    }
    hex_fp = {
        r.id: sorted(int(h, 16) for h in r.fingerprints)
        for r in ta.winnowing_fingerprints(
            docs, portable=True, portable_hex=True
        ).collect()
    }
    assert long_fp == hex_fp
