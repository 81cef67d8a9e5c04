"""BPE tokenizer training: hand-pinned merges, determinism, and the
compression invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from programmers_data_spark import registry
from programmers_data_spark.queries.tokenizer_ops import (
    encode_word,
    learn_bpe_merges,
)

registry.load_all()


def test_learn_merges_hand_example():
    """{abab:2, abc:1}: pair (a,b) has weighted count 5 -> first
    merge; then (ab,ab):2 beats (ab,c):1; ties never arise."""
    m = learn_bpe_merges([("abab", 2), ("abc", 1)], 3)
    assert m == [("a", "b"), ("ab", "ab"), ("ab", "c")]
    ranks = {p: i for i, p in enumerate(m)}
    assert encode_word("abababc", ranks) == ["abab", "abc"]


def test_learn_merges_tie_breaks_lexicographic():
    """Equal-count pairs must pick the lexicographically smallest —
    the determinism contract behind the rows-only driver check."""
    # "ba" and "ab" each appear once -> counts tie at 1
    m = learn_bpe_merges([("ab", 1), ("ba", 1)], 1)
    assert m == [("a", "b")]


WORDS = st.lists(
    st.tuples(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=1,
    max_size=15,
)


@given(words=WORDS, n=st.integers(min_value=0, max_value=10))
@settings(max_examples=50, deadline=None)
def test_encode_properties(words, n):
    """For any corpus: merges are deterministic, every merged symbol
    concatenates its parts, encoding round-trips the word, and token
    count never exceeds character count."""
    m1 = learn_bpe_merges(words, n)
    m2 = learn_bpe_merges(list(words), n)
    assert m1 == m2
    assert len(m1) <= n
    ranks = {p: i for i, p in enumerate(m1)}
    for w, _ in words:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w
        assert len(toks) <= len(w)


@given(words=WORDS)
@settings(max_examples=25, deadline=None)
def test_more_merges_never_expand(words):
    """Monotone compression: a superset of merges cannot increase any
    word's token count (extra merges only add rewrite options)."""
    few = learn_bpe_merges(words, 3)
    many = learn_bpe_merges(words, 10)
    assert many[: len(few)] == few  # prefix-stable merge list
    r_few = {p: i for i, p in enumerate(few)}
    r_many = {p: i for i, p in enumerate(many)}
    for w, _ in words:
        assert len(encode_word(w, r_many)) <= len(encode_word(w, r_few))


def test_bpe_queries_deterministic_and_compressive(spark, sf_oracle):
    a = registry.QUERIES["bpe_merges"](spark, sf_oracle).collect()
    b = registry.QUERIES["bpe_merges"](spark, sf_oracle).collect()
    assert a == b and len(a) > 0
    assert all(r.merged == r.left + r.right for r in a)
    assert [r.rank for r in a] == list(range(len(a)))

    counts = registry.QUERIES["bpe_encoded_counts"](spark, sf_oracle).collect()
    assert len(counts) > 0
    assert all(r.n_tokens <= r.n_chars_alpha for r in counts)
    # the learned vocab must actually compress the corpus
    total_t = sum(r.n_tokens for r in counts)
    total_c = sum(r.n_chars_alpha for r in counts)
    assert total_t < total_c
