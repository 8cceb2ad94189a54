"""Bag-of-binary-words vocabulary as device arrays (DBoW2-compatible).

Capability parity with /root/reference/src/vocabulary/mod.rs:
  * tree descent quantization (k-way, L levels, Hamming metric) — here one
    batched gather + MXU Hamming argmin per level instead of a per-feature
    recursive walk (mod.rs:230-251);
  * L1-normalized TF-IDF BowVector (mod.rs:290-322);
  * L1 similarity score s = 1 - 0.5*||v1 - v2||_1 (mod.rs:357-374) — computed
    for ALL stored keyframes at once as one dense matrix op;
  * DBoW2 text-format loader (mod.rs:94-206) for real ORBvoc.txt files.

Since no ORBvoc ships in this environment, `train_vocabulary` builds a tree
from a descriptor corpus by recursive binary k-means (majority-bit centers,
Hamming assignment) — the same construction DBoW2 uses.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops.hamming import hamming_matrix


class Vocabulary(NamedTuple):
    """k-way tree, `levels` deep. Level l has k^(l+1) nodes; children of
    node n (local index at its level) are local indices n*k..n*k+k-1."""

    level_desc: tuple  # per level: (k^(l+1), 32) uint8 node centers
    idf: jnp.ndarray  # (n_leaves,) inverse-document-frequency weights
    k: int
    levels: int

    @property
    def n_leaves(self):
        return self.idf.shape[0]


# -------------------------------------------------------------- training
def _unpack_bits_np(desc):
    return np.unpackbits(desc, axis=-1, bitorder="little")


def _pack_bits_np(bits):
    return np.packbits(bits, axis=-1, bitorder="little")


def _hamming_np(a, b):
    """(Na, 32) x (Nb, 32) -> (Na, Nb) int"""
    ba = _unpack_bits_np(a).astype(np.int16)
    bb = _unpack_bits_np(b).astype(np.int16)
    # distance = 256 - matches = (256 - a.b_pm1)/2 trick in int space
    return (256 - (2 * ba - 1) @ (2 * bb - 1).T) // 2


def _kmeans_binary(desc, k, rng, iters=8):
    """Binary k-means with Hamming assignment + majority-bit centers."""
    n = len(desc)
    if n <= k:
        centers = np.zeros((k, 32), np.uint8)
        centers[:n] = desc
        if n < k:
            centers[n:] = desc[rng.integers(0, n, k - n)] if n else 0
        assign = np.arange(n) % k
        return centers, assign
    centers = desc[rng.choice(n, k, replace=False)]
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        d = _hamming_np(desc, centers)
        assign = d.argmin(1)
        for c in range(k):
            sel = desc[assign == c]
            if len(sel) == 0:
                centers[c] = desc[rng.integers(0, n)]
            else:
                bits = _unpack_bits_np(sel)
                centers[c] = _pack_bits_np((bits.mean(0) >= 0.5).astype(np.uint8))
    return centers, assign


def train_vocabulary(descriptors: np.ndarray, k: int = 10, levels: int = 3,
                     seed: int = 0, doc_ids: np.ndarray | None = None) -> Vocabulary:
    """Build a k^levels-leaf tree from a (N, 32) uint8 corpus.

    doc_ids: optional (N,) frame/document index per descriptor for IDF
    estimation; defaults to all-one-document (uniform idf).
    """
    rng = np.random.default_rng(seed)
    level_desc = []
    # recursive split, breadth-first
    groups = [descriptors]
    group_members = [np.arange(len(descriptors))]
    for lv in range(levels):
        centers_lv = np.zeros((k ** (lv + 1), 32), np.uint8)
        new_groups = []
        new_members = []
        for gi, g in enumerate(groups):
            centers, assign = _kmeans_binary(g, k, rng)
            centers_lv[gi * k : (gi + 1) * k] = centers
            for c in range(k):
                sel = assign == c
                new_groups.append(g[sel] if len(g) else g)
                new_members.append(group_members[gi][sel] if len(g) else group_members[gi])
        groups = new_groups
        group_members = new_members
        level_desc.append(jnp.asarray(centers_lv))

    n_leaves = k**levels
    # idf from document frequency
    if doc_ids is None:
        idf = np.ones(n_leaves, np.float32)
    else:
        n_docs = int(doc_ids.max()) + 1
        df = np.zeros(n_leaves, np.float64)
        for leaf, members in enumerate(group_members):
            if len(members):
                df[leaf] = len(np.unique(doc_ids[members]))
        idf = np.log(n_docs / np.maximum(df, 1.0)).astype(np.float32) + 1e-3
    return Vocabulary(tuple(level_desc), jnp.asarray(idf), k, levels)


# -------------------------------------------------------------- runtime
def quantize(vocab: Vocabulary, desc, valid):
    """(N, 32) uint8 -> (N,) int32 leaf ids (device, batched descent)."""
    N = desc.shape[0]
    local = jnp.zeros((N,), jnp.int32)
    for lv in range(vocab.levels):
        base = local * vocab.k
        # distances to this level's k children of each feature's node
        cand = vocab.level_desc[lv]  # (k^(lv+1), 32)
        d_all = hamming_matrix(desc, cand)  # (N, k^(lv+1)) — MXU matmul
        idx = base[:, None] + jnp.arange(vocab.k)[None, :]
        d = jnp.take_along_axis(d_all, idx, axis=1)  # (N, k)
        local = base + jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(valid, local, -1)


def bow_vector(vocab: Vocabulary, leaf_ids):
    """(N,) leaf ids -> L1-normalized TF-IDF vector (n_leaves,)."""
    ok = leaf_ids >= 0
    tf = jnp.zeros((vocab.n_leaves,), jnp.float32).at[
        jnp.where(ok, leaf_ids, 0)
    ].add(ok.astype(jnp.float32))
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def transform(vocab: Vocabulary, desc, valid):
    """Full transform: descriptors -> (bow_vector, leaf_ids)."""
    leaves = quantize(vocab, desc, valid)
    return bow_vector(vocab, leaves), leaves


def score_l1(v1, v2):
    """DBoW2 L1 score between L1-normalized vectors: 1 - 0.5*||v1-v2||_1.

    Broadcasts: v1 (V,) or (A, V), v2 (V,) or (B, V).
    """
    return 1.0 - 0.5 * jnp.sum(
        jnp.abs(v1[..., None, :] - v2[None, ...]) if v1.ndim == v2.ndim == 2
        else jnp.abs(v1 - v2),
        axis=-1,
    )


def load_dbow2_text(path: str) -> Vocabulary:
    """Load a DBoW2 text vocabulary (ORBvoc.txt format): header `k L s1 s2`,
    then one line per node: parent_id is_leaf 32-bytes weight.
    (reference: vocabulary/mod.rs:94-206)
    """
    with open(path) as f:
        header = f.readline().split()
        k, levels = int(header[0]), int(header[1])
        children: dict[int, list[int]] = {0: []}
        descs = [np.zeros(32, np.uint8)]
        weights = [0.0]
        parents = [0]
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parent = int(parts[0])
            d = np.array([int(x) for x in parts[2:34]], np.uint8)
            w = float(parts[34])
            nid = len(descs)
            descs.append(d)
            weights.append(w)
            parents.append(parent)
            children.setdefault(parent, []).append(nid)
            children.setdefault(nid, [])

    # breadth-first flatten into per-level dense arrays, padding missing
    # children with copies of the parent's descriptor (never win argmin
    # ties incorrectly since identical distance -> same subtree)
    level_desc = []
    idf_leaves = []
    frontier = [0]  # node id per local slot at the current level
    expanded: set[int] = set()
    for lv in range(levels):
        n_nodes = k ** (lv + 1)
        arr = np.zeros((n_nodes, 32), np.uint8)
        next_frontier = [-1] * n_nodes
        for local_idx, node in enumerate(frontier):
            base = local_idx * k
            # a node id can occupy several slots (padding); expand its real
            # children only once, pad every other slot with its own desc
            kids = children.get(node, []) if node not in expanded else []
            if node not in expanded:
                expanded.add(node)
            for j in range(k):
                if j < len(kids):
                    c = kids[j]
                    arr[base + j] = descs[c]
                    next_frontier[base + j] = c
                else:
                    arr[base + j] = descs[node] if node >= 0 else 0
                    next_frontier[base + j] = node
        level_desc.append(jnp.asarray(arr))
        frontier = next_frontier
        if lv == levels - 1:
            idf_leaves = [weights[c] if c >= 0 else 0.0 for c in frontier]
    return Vocabulary(
        tuple(level_desc), jnp.asarray(np.asarray(idf_leaves, np.float32)), k, levels
    )
