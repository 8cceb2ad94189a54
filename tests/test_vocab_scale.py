"""Vocabulary at real-DBoW2 scale + structural edge cases.

Round-1 weak #2: descent computed distances to ALL k^(l+1) level nodes —
~4 GB at ORBvoc scale (k=10, L=6, 1M leaves). The rewritten descent
gathers each feature's k children only; these tests pin (a) under-full
node masking (ADVICE r1: padded slots must not win the argmin), (b)
early-leaf carry-through, (c) save/load round-trip, and (d) a full-scale
synthesized k=10 L=6 vocabulary loading and quantizing 1024 descriptors.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.loop import vocab as vb


def _write_voc(path, k, L, nodes):
    """nodes: list of (parent, is_leaf, desc (32,), weight)."""
    lines = [f"{k} {L} 0 0"]
    for p, leaf, d, w in nodes:
        lines.append(f"{p} {leaf} " + " ".join(str(int(x)) for x in d) + f" {w}")
    path.write_text("\n".join(lines) + "\n")


def test_underfull_node_masks_padded_slots(tmp_path):
    """A node with < k children: the missing slot must NEVER win the
    argmin, even for a query exactly equal to the parent's descriptor."""
    k, L = 2, 2
    z = np.zeros(32, np.uint8)
    ones = np.full(32, 255, np.uint8)
    half = np.zeros(32, np.uint8)
    half[:16] = 255
    # root -> n1 (desc z), n2 (desc ones)
    # n1 -> ONLY one child leaf3 (desc half); n2 -> leaf4, leaf5
    nodes = [
        (0, 0, z, 0.0),      # id 1
        (0, 0, ones, 0.0),   # id 2
        (1, 1, half, 0.3),   # id 3 — only child of n1
        (2, 1, ones, 0.5),   # id 4
        (2, 1, z, 0.7),      # id 5
    ]
    p = tmp_path / "v.txt"
    _write_voc(p, k, L, nodes)
    voc = vb.load_dbow2_text(str(p))
    # query == z: descends into n1 (distance 0); at the bottom the only
    # valid slot is leaf3 even though a padded copy of n1's desc (z) would
    # be distance 0 < 128
    leaf = int(vb.quantize(voc, jnp.asarray(z[None]), jnp.ones(1, bool))[0])
    w = float(voc.idf[leaf])
    assert w == pytest.approx(0.3), f"descent diverted to padded slot (leaf {leaf})"


def test_early_leaf_carry_through(tmp_path):
    """A leaf one level above the bottom must carry through and keep its
    weight at the bottom level."""
    k, L = 2, 2
    z = np.zeros(32, np.uint8)
    ones = np.full(32, 255, np.uint8)
    nodes = [
        (0, 1, z, 0.9),      # id 1: EARLY leaf at level 0
        (0, 0, ones, 0.0),   # id 2: interior
        (2, 1, ones, 0.5),   # id 3
        (2, 1, z, 0.7),      # id 4
    ]
    p = tmp_path / "v.txt"
    _write_voc(p, k, L, nodes)
    voc = vb.load_dbow2_text(str(p))
    leaf = int(vb.quantize(voc, jnp.asarray(z[None]), jnp.ones(1, bool))[0])
    assert float(voc.idf[leaf]) == pytest.approx(0.9)


def test_save_load_roundtrip_quantization():
    rng = np.random.default_rng(0)
    corpus = rng.integers(0, 256, (4000, 32)).astype(np.uint8)
    voc = vb.train_vocabulary(corpus, k=4, levels=3)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "voc.txt")
        vb.save_dbow2_text(voc, path)
        voc2 = vb.load_dbow2_text(path)
    q = rng.integers(0, 256, (256, 32)).astype(np.uint8)
    l1 = np.asarray(vb.quantize(voc, jnp.asarray(q), jnp.ones(256, bool)))
    l2 = np.asarray(vb.quantize(voc2, jnp.asarray(q), jnp.ones(256, bool)))
    np.testing.assert_array_equal(l1, l2)


def test_sparse_bow_matches_dense():
    rng = np.random.default_rng(3)
    corpus = rng.integers(0, 256, (2000, 32)).astype(np.uint8)
    voc = vb.train_vocabulary(corpus, k=5, levels=3)
    desc = jnp.asarray(rng.integers(0, 256, (128, 32)).astype(np.uint8))
    valid = jnp.ones(128, bool)
    dense, leaves = vb.transform(voc, desc, valid)
    ids, w = vb.bow_sparse(voc, leaves)
    # reconstruct dense from sparse
    recon = np.zeros(voc.n_leaves, np.float32)
    ids_np, w_np = np.asarray(ids), np.asarray(w)
    for i, wi in zip(ids_np, w_np):
        if i >= 0:
            recon[i] += wi
    np.testing.assert_allclose(recon, np.asarray(dense), atol=1e-6)
    # sparse scoring == dense L1 scoring
    desc2 = jnp.asarray(rng.integers(0, 256, (128, 32)).astype(np.uint8))
    dense2, leaves2 = vb.transform(voc, desc2, valid)
    ids2, w2 = vb.bow_sparse(voc, leaves2)
    s_dense = float(vb.score_l1(dense, dense2))
    s_sparse = float(
        vb.score_sparse_many(voc, ids, w, ids2[None], w2[None])[0]
    )
    assert s_sparse == pytest.approx(s_dense, abs=1e-5)


@pytest.mark.slow
def test_orbvoc_scale_load_and_descent(tmp_path):
    """Synthesized FULL k=10 L=6 vocabulary (1.11M nodes — the real
    ORBvoc.txt shape): must load and quantize N=1024 descriptors without
    the round-1 OOM (which materialized a (1024 x 1e6) distance matrix)."""
    k, L = 10, 6
    rng = np.random.default_rng(1)
    n_nodes = sum(k ** (lv + 1) for lv in range(L))
    descs = rng.integers(0, 256, (n_nodes, 32), dtype=np.uint8)

    # breadth-first parent ids matching save_dbow2_text's layout
    offsets = [1]
    for lv in range(L):
        offsets.append(offsets[-1] + k ** (lv + 1))
    chunks = [f"{k} {L} 0 0"]
    idx = 0
    for lv in range(L):
        n_lv = k ** (lv + 1)
        parents = (
            np.zeros(n_lv, np.int64)
            if lv == 0
            else offsets[lv - 1] + np.arange(n_lv) // k
        )
        is_leaf = 1 if lv == L - 1 else 0
        block = descs[idx : idx + n_lv].tolist()
        idx += n_lv
        w = " 1.0" if is_leaf else " 0.0"
        chunks.extend(
            f"{p} {is_leaf} " + " ".join(map(str, row)) + w
            for p, row in zip(parents.tolist(), block)
        )
    path = tmp_path / "orbvoc_synth.txt"
    path.write_text("\n".join(chunks) + "\n")

    voc = vb.load_dbow2_text(str(path))
    assert voc.n_leaves == k**L
    q = jnp.asarray(rng.integers(0, 256, (1024, 32), dtype=np.uint8))
    leaves = vb.quantize(voc, q, jnp.ones(1024, bool))
    leaves_np = np.asarray(leaves)
    assert ((leaves_np >= 0) & (leaves_np < k**L)).all()
    # sparse BoW + database scoring at full scale
    ids, w = vb.bow_sparse(voc, leaves)
    s = vb.score_sparse_many(voc, ids, w, ids[None], w[None])
    assert float(s[0]) == pytest.approx(1.0, abs=1e-4)  # self-score
