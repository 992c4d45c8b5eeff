"""Posting algebra tests: the vectorized ops must match a straight
state-machine rendering of the documented reference semantics
(ref Docodo.NET/IndexSequence.cs:218-322), fuzzed over random inputs."""

import numpy as np
import pytest

from docodo_tpu.core.postings import PostingSeq, group_and, or_merge


# --- scalar state machines (semantics oracle for the vectorized forms) -----

def and_state_machine(a, b, r1, r2):
    """Two-pointer merge with group windows, ordered-mode cuts and
    both-operand emission — the sequential semantics the reference defines."""
    abs_r = max(abs(r1), abs(r2))
    r = -abs_r if (r1 < 0 and r2 < 0) else abs_r
    i = j = 0
    out = []
    group = []
    in_a = in_b = False

    def flush():
        nonlocal group, in_a, in_b
        if in_a and in_b:
            out.extend(group)
        group = []
        in_a = in_b = False

    while i < len(a) or j < len(b):
        if i >= len(a):
            val, tag_a, tag_b = b[j], False, True
            j += 1
        elif j >= len(b):
            val, tag_a, tag_b = a[i], True, False
            i += 1
        elif a[i] < b[j]:
            val, tag_a, tag_b = a[i], True, False
            i += 1
        elif a[i] > b[j]:
            val, tag_a, tag_b = b[j], False, True
            j += 1
        else:
            val, tag_a, tag_b = a[i], True, True
            i += 1
            j += 1
        if group:
            finish = False
            if abs_r != 0 and val - group[-1] > abs_r:
                finish = True
            elif r < 0 and tag_a and not in_a:
                finish = True
            if finish:
                flush()
        if tag_a:
            in_a = True
        if tag_b:
            in_b = True
        group.append(val)
    flush()
    return np.array(out, dtype=np.uint64), r


def or_state_machine(a, b, r1, r2):
    abs_r = max(abs(r1), abs(r2))
    r = -abs_r if (r1 < 0 and r2 < 0) else abs_r
    i = j = 0
    out = []
    while i < len(a) or j < len(b):
        if i >= len(a):
            out.append(b[j]); j += 1
        elif j >= len(b):
            out.append(a[i]); i += 1
        elif a[i] < b[j]:
            out.append(a[i]); i += 1
        elif a[i] > b[j]:
            out.append(b[j]); j += 1
        else:
            out.append(a[i]); i += 1; j += 1
    return np.array(out, dtype=np.uint64), r


def random_ascending(rng, n, max_delta, dup_prob=0.2):
    deltas = rng.integers(1, max_delta, size=n, dtype=np.uint64)
    if n and dup_prob:
        deltas[rng.random(n) < dup_prob] = 0
    return np.cumsum(deltas, dtype=np.uint64)


# --- directed cases ---------------------------------------------------------

def test_and_simple_window():
    a = np.array([10, 100, 200], dtype=np.uint64)
    b = np.array([12, 150, 205], dtype=np.uint64)
    coords, r = group_and(a, b, 5, 5)
    # groups: [10,12] ok; [100] alone; [150] alone; [200,205] ok
    np.testing.assert_array_equal(coords, [10, 12, 200, 205])
    assert r == 5


def test_and_emits_both_operands_positions():
    # phrase semantics keep the coordinates of every matched word
    a = np.array([0], dtype=np.uint64)
    b = np.array([4], dtype=np.uint64)
    coords, _ = group_and(a, b, -7, -8)
    np.testing.assert_array_equal(coords, [0, 4])


def test_and_ordered_rejects_wrong_order():
    # "lady old": left word must start the group in ordered mode
    a = np.array([100], dtype=np.uint64)  # left (first word of phrase)
    b = np.array([95], dtype=np.uint64)   # right word occurs before it
    coords, r = group_and(a, b, -8, -8)
    assert coords.size == 0
    assert r == -8


def test_and_unordered_accepts_any_order():
    a = np.array([100], dtype=np.uint64)
    b = np.array([95], dtype=np.uint64)
    coords, _ = group_and(a, b, 8, 8)
    np.testing.assert_array_equal(coords, [95, 100])


def test_and_r_combination():
    # result ordered only when both operands ordered
    a = np.array([1], dtype=np.uint64)
    b = np.array([2], dtype=np.uint64)
    assert group_and(a, b, -5, 3)[1] == 5
    assert group_and(a, b, -5, -3)[1] == -5
    assert group_and(a, b, 5, 3)[1] == 5


def test_and_zero_window_groups_everything():
    a = np.array([1, 1000], dtype=np.uint64)
    b = np.array([500000], dtype=np.uint64)
    coords, _ = group_and(a, b, 0, 0)
    np.testing.assert_array_equal(coords, [1, 1000, 500000])


def test_or_dedupes_across_operands():
    a = np.array([1, 5, 9], dtype=np.uint64)
    b = np.array([5, 7], dtype=np.uint64)
    coords, _ = or_merge(a, b, 0, 0)
    np.testing.assert_array_equal(coords, [1, 5, 7, 9])


def test_or_keeps_within_operand_duplicates():
    a = np.array([5, 5], dtype=np.uint64)
    b = np.array([5], dtype=np.uint64)
    coords, _ = or_merge(a, b, 0, 0)
    np.testing.assert_array_equal(coords, [5, 5])


def test_empty_operands():
    e = np.zeros(0, dtype=np.uint64)
    x = np.array([3, 9], dtype=np.uint64)
    assert group_and(e, x, 5, 5)[0].size == 0
    assert group_and(x, e, 5, 5)[0].size == 0
    np.testing.assert_array_equal(or_merge(e, x, 1, 2)[0], x)
    np.testing.assert_array_equal(or_merge(x, e, 1, 2)[0], x)


# --- fuzz: vectorized == state machine --------------------------------------

@pytest.mark.parametrize("ordered", [False, True])
@pytest.mark.parametrize("max_delta", [3, 20, 1000])
def test_and_fuzz(rng, ordered, max_delta):
    for trial in range(60):
        na, nb = rng.integers(0, 60, size=2)
        a = random_ascending(rng, int(na), max_delta)
        b = random_ascending(rng, int(nb), max_delta)
        r1 = int(rng.integers(0, 30))
        r2 = int(rng.integers(0, 30))
        if ordered:
            r1, r2 = -max(r1, 1), -max(r2, 1)
        got, gr = group_and(a, b, r1, r2)
        want, wr = and_state_machine(a.tolist(), b.tolist(), r1, r2)
        assert gr == wr
        np.testing.assert_array_equal(got, want, err_msg=f"trial={trial} r=({r1},{r2})")


def test_or_fuzz(rng):
    for _ in range(100):
        na, nb = rng.integers(0, 80, size=2)
        a = random_ascending(rng, int(na), 50)
        b = random_ascending(rng, int(nb), 50)
        got, gr = or_merge(a, b, 3, -4)
        want, wr = or_state_machine(a.tolist(), b.tolist(), 3, -4)
        assert gr == wr
        np.testing.assert_array_equal(got, want)


def test_chained_phrase():
    """Three-word phrase fold: (A*B)*C keeps intermediate coords and max-R."""
    # text: "old lady who" at 0; "lady old who" at 100 (wrong order)
    A = PostingSeq(np.array([0, 105], dtype=np.uint64), R=-7)   # old
    B = PostingSeq(np.array([4, 100], dtype=np.uint64), R=-8)   # lady
    C = PostingSeq(np.array([9, 109], dtype=np.uint64), R=-7)   # who
    res = (A * B) * C
    assert res.order
    np.testing.assert_array_equal(res.coords, [0, 4, 9])
