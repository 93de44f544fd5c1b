"""Index-layer tests: byte-exact BWA index build + FM-index query ops
verified against brute-force string search."""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speedseq_tpu.formats.fasta import FastaFile
from speedseq_tpu.index import pack, suffix
from speedseq_tpu.index.bwt import build_index, load_index
from speedseq_tpu.index import fm as fm_mod
from speedseq_tpu.index.fm import (
    FMIndex,
    BiInterval,
    backward_ext,
    forward_ext,
    interval_init,
    occ_all,
    sa_lookup,
    get_ref_window,
)

REF_PREFIX = "/root/reference/example/data/human_g1k_v37_20_42220611-42542245.fasta"


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("idx")
    fa = str(d / "ref.fasta")
    shutil.copy(REF_PREFIX, fa)
    shutil.copy(REF_PREFIX + ".fai", fa + ".fai")
    idx = build_index(fa, prefix=str(d / "out"))
    return d, idx


def test_pac_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    for n in [1, 3, 4, 5, 1000]:
        bases = rng.integers(0, 4, size=n).astype(np.uint8)
        p = str(tmp_path / f"t{n}.pac")
        pack.write_pac(p, bases)
        back = pack.read_pac(p)
        assert np.array_equal(back, bases)


def test_suffix_array_small():
    # banana (codes) — verify against brute force
    text = np.array([1, 0, 3, 0, 3, 0], dtype=np.uint8)
    sa = suffix.suffix_array(text)
    suffixes = ["".join(map(str, text[i:])) for i in range(len(text))] + [""]
    expected = sorted(range(len(text) + 1), key=lambda i: suffixes[i] if i < len(text) else "")
    # sentinel suffix ranks first; brute force: compare padded
    def key(i):
        return list(text[i:]) + [-1]
    expected = sorted(range(len(text) + 1), key=key)
    assert sa.tolist() == expected


def test_suffix_array_random_vs_bruteforce():
    rng = np.random.default_rng(7)
    text = rng.integers(0, 4, size=500).astype(np.uint8)
    sa = suffix.suffix_array(text)
    def key(i):
        return list(text[i:]) + [-1]
    expected = sorted(range(len(text) + 1), key=key)
    assert sa.tolist() == expected


def test_index_byte_identical_to_bwa(built):
    d, _ = built
    for ext in ["pac", "bwt", "sa", "ann", "amb"]:
        ours = open(str(d / f"out.{ext}"), "rb").read()
        theirs = open(f"{REF_PREFIX}.{ext}", "rb").read()
        assert ours == theirs, f".{ext} differs from real bwa output"


def test_load_roundtrip(built):
    d, idx = built
    idx2 = load_index(str(d / "out"))
    assert idx2.primary == idx.primary
    assert np.array_equal(idx2.L2, idx.L2)
    assert np.array_equal(idx2.bwt_words, idx.bwt_words)
    assert np.array_equal(idx2.occ, idx.occ)
    assert np.array_equal(idx2.sa_samples, idx.sa_samples)
    assert np.array_equal(idx2.pac, idx.pac)
    assert idx2.names == ["20_slice"]


@pytest.fixture(scope="module")
def fmidx(built):
    d, idx = built
    # exercise the host SA-reconstruction path (what a foreign bwa index
    # would use)
    return FMIndex.from_bwa(idx), idx


def _fmd_text(idx):
    pac = idx.pac
    return np.concatenate([pac, 3 - pac[::-1]])


def test_occ_vs_bruteforce(fmidx):
    fm, idx = fmidx
    text = _fmd_text(idx)
    sa = suffix.suffix_array(text)
    bwt_codes, primary = suffix.bwt_from_sa(text, sa)
    assert primary == idx.primary
    n = len(text)
    rng = np.random.default_rng(3)
    ks = np.concatenate([[0, 1, int(primary), int(primary) + 1, n, n + 1 - 1],
                         rng.integers(0, n + 1, size=64)]).astype(np.int32)
    got = np.asarray(occ_all(fm, jnp.asarray(ks)))
    # brute force over conceptual rows [0, k)
    concept = np.full(n + 1, -1, dtype=np.int64)
    stored_idx = np.concatenate([np.arange(primary), np.arange(primary + 1, n + 1)])
    concept[stored_idx] = bwt_codes
    for k, row in zip(ks, got):
        for c in range(4):
            assert row[c] == np.sum(concept[:k] == c), (k, c)


def test_backward_search_exact_match(fmidx):
    fm, idx = fmidx
    fa = FastaFile(REF_PREFIX)
    genome = fa.fetch_encoded("20_slice")
    rng = np.random.default_rng(11)
    B = 32
    L = 25
    starts = rng.integers(0, len(genome) - L, size=B)
    patterns = np.stack([genome[s : s + L] for s in starts])
    # backward search: prepend from last base to first
    iv = interval_init(fm, jnp.asarray(patterns[:, -1].astype(np.int32)))
    for j in range(L - 2, -1, -1):
        iv = backward_ext(fm, iv, jnp.asarray(patterns[:, j].astype(np.int32)))
    s = np.asarray(iv.s)
    assert (s >= 1).all()  # every pattern occurs at least once
    # resolve one hit per pattern via SA; position must map back to a true
    # occurrence on either strand
    ranks = np.asarray(iv.k, dtype=np.int32)
    pos = np.asarray(sa_lookup(fm, jnp.asarray(ranks)))
    l_pac = int(idx.l_pac)
    for b in range(B):
        p = int(pos[b])
        if p < l_pac:  # forward-strand hit
            assert np.array_equal(genome[p : p + L], patterns[b])
        else:  # reverse-strand hit: text[p:p+L] = revcomp(genome segment)
            fstart = 2 * l_pac - (p + L)
            seg = genome[fstart : fstart + L]
            assert np.array_equal(3 - seg[::-1], patterns[b])


def test_backward_search_counts_match_bruteforce(fmidx):
    fm, idx = fmidx
    fa = FastaFile(REF_PREFIX)
    genome = fa.fetch_encoded("20_slice")
    text = _fmd_text(idx)
    rng = np.random.default_rng(13)
    for L in [8, 12]:
        s0 = int(rng.integers(0, len(genome) - L))
        patt = genome[s0 : s0 + L].astype(np.int32)
        iv = interval_init(fm, jnp.asarray(patt[-1]))
        for j in range(L - 2, -1, -1):
            iv = backward_ext(fm, iv, jnp.asarray(patt[j]))
        # brute-force occurrence count in the FMD text
        cnt = 0
        pl = patt.astype(np.uint8)
        for i in range(len(text) - L + 1):
            if np.array_equal(text[i : i + L], pl):
                cnt += 1
        assert int(iv.s) == cnt


def test_forward_ext_matches_backward(fmidx):
    fm, idx = fmidx
    fa = FastaFile(REF_PREFIX)
    genome = fa.fetch_encoded("20_slice")
    patt = genome[1000:1015].astype(np.int32)
    # build interval by forward extension from first base
    iv_f = interval_init(fm, jnp.asarray(patt[0]))
    for j in range(1, len(patt)):
        iv_f = forward_ext(fm, iv_f, jnp.asarray(patt[j]))
    # and by backward extension from last base
    iv_b = interval_init(fm, jnp.asarray(patt[-1]))
    for j in range(len(patt) - 2, -1, -1):
        iv_b = backward_ext(fm, iv_b, jnp.asarray(patt[j]))
    assert int(iv_f.s) == int(iv_b.s)
    assert int(iv_f.k) == int(iv_b.k)


def test_sa_lookup_all_sampled_ranks(fmidx):
    fm, idx = fmidx
    # verify sa_lookup against the rank-sampled values bwa stores on disk
    n_sa = len(idx.sa_samples)
    ranks = (np.arange(1, min(n_sa, 200)) * idx.sa_intv).astype(np.int32)
    got = np.asarray(sa_lookup(fm, jnp.asarray(ranks)))
    assert np.array_equal(got, idx.sa_samples[1:200][: len(ranks)])


def test_sa_lookup_random_ranks(fmidx):
    fm, idx = fmidx
    text = _fmd_text(idx)
    sa = suffix.suffix_array(text)
    rng = np.random.default_rng(17)
    ranks = rng.integers(1, len(text), size=128).astype(np.int32)
    got = np.asarray(sa_lookup(fm, jnp.asarray(ranks)))
    assert np.array_equal(got, sa[ranks])


def test_get_ref_window(fmidx):
    fm, idx = fmidx
    fa = FastaFile(REF_PREFIX)
    genome = fa.fetch_encoded("20_slice")
    w = np.asarray(get_ref_window(fm, jnp.asarray([100, -5, len(genome) - 3], dtype=jnp.int32), 10))
    assert np.array_equal(w[0], genome[100:110])
    assert (w[1][:5] == 4).all() and np.array_equal(w[1][5:], genome[0:5])
    assert np.array_equal(w[2][:3], genome[-3:]) and (w[2][3:] == 4).all()


def test_ambiguous_base_handling(tmp_path):
    # genome with N runs: holes recorded, fill deterministic (lrand48 seed 11)
    p = str(tmp_path / "amb.fa")
    with open(p, "w") as fh:
        fh.write(">s1\nACGTNNNACGTACGTNACGT\n>s2\nNNACGT\n")
    idx = build_index(p, prefix=str(tmp_path / "amb"), write_files=True)
    assert idx.l_pac == 26
    assert len(idx.holes) == 3
    assert [(h.offset, h.length) for h in idx.holes] == [(4, 3), (15, 1), (20, 2)]
    assert idx.n_ambs == [2, 1]
    # deterministic fill
    idx2 = build_index(p, prefix=str(tmp_path / "amb2"), write_files=False)
    assert np.array_equal(idx.pac, idx2.pac)
    assert (idx.pac < 4).all()
