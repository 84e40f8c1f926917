"""Mini-batch GNN training from neighbor-sampling output.

The cugraph-pyg/cugraph-dgl role (consuming the sampler's per-batch
compressed CSR, SURVEY.md §3.5 step 3-4) implemented natively: sampled
blocks become fixed-shape padded subgraph tensors that jit cleanly — batches
of differing sizes pad to the same static shape so one compiled train step
serves the whole epoch (the TPU equivalent of the reference's variable-size
per-batch frames).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_tpu.core.structure import CsrMatrix, GraphStructure


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SampledBatch:
    """One sampled neighborhood as a padded device subgraph.

    ``g`` is a GraphStructure over the batch-local (renumbered) vertex space;
    ``global_ids[i]`` maps local vertex i → global id (−1 padding);
    ``seed_mask`` marks the seed rows (the first vertices of the renumber
    map, per the post-processing convention)."""

    g: GraphStructure
    global_ids: jax.Array   # int32 [pad_v]
    seed_mask: jax.Array    # bool  [pad_v]
    num_seeds: int = field(metadata=dict(static=True))


def batch_from_sampling(pack: dict, *, pad_vertices: int, pad_edges: int,
                        num_seeds: int) -> SampledBatch:
    """Build a SampledBatch from one entry of
    ``sampling_results_to_batches`` output, padded to static shapes."""
    vmap = np.asarray(pack["map"])
    n_local = len(vmap)
    if n_local > pad_vertices:
        raise ValueError(f"batch has {n_local} vertices > pad {pad_vertices}")
    srcs, dsts, ws = [], [], []
    for hop in pack["hops"]:
        offs, idx = hop["offsets"], hop["indices"]
        s = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        srcs.append(s)
        dsts.append(idx)
        ws.append(hop.get("weight", np.ones(len(idx))))
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    w = np.concatenate(ws).astype(np.float32) if ws else None
    if len(src) > pad_edges:
        raise ValueError(f"batch has {len(src)} edges > pad {pad_edges}")

    # message flow: aggregate from sampled neighbor (dst) INTO the seed-side
    # vertex (src) — build the structure with edges dst→src so csc in-edges
    # of a vertex are its sampled neighbors.  e_align = pad_edges pins the
    # edge padding so every batch shares ONE static shape (one compile).
    from cugraph_tpu.core.structure import build_csr_host

    g = GraphStructure(
        csr=build_csr_host(dst, src, w, pad_vertices, e_align=pad_edges),
        csc=build_csr_host(src, dst, w, pad_vertices, e_align=pad_edges),
    )

    gids = np.full(g.pad_v, -1, np.int32)
    gids[:n_local] = vmap
    seed = np.zeros(g.pad_v, bool)
    seed[:num_seeds] = True
    return SampledBatch(
        g=g,
        global_ids=jnp.asarray(gids),
        seed_mask=jnp.asarray(seed),
        num_seeds=num_seeds,
    )


def make_batches(G, seeds, fanouts, *, batch_size: int = 32,
                 features: np.ndarray | None = None, random_state=0):
    """Epoch iterator: sample per seed-batch and yield
    (SampledBatch, features_local [pad_v, F] or None).

    Static pad sizes derive from the fanout product so every batch compiles
    once."""
    import cugraph_tpu as ct

    seeds = np.asarray(seeds)
    k_prod = 1
    n_max = batch_size
    for k in fanouts:
        k_prod *= max(int(k), 1)
        n_max += batch_size * k_prod
    pad_v = max(64, int(1.2 * n_max))
    pad_e = max(128, int(1.5 * (n_max - batch_size)))

    for lo in range(0, len(seeds), batch_size):
        batch_seeds = seeds[lo: lo + batch_size]
        df = ct.uniform_neighbor_sample(G, batch_seeds, list(fanouts),
                                        with_replacement=False,
                                        random_state=random_state + lo)
        df = df.assign(batch_id=0)  # one combined neighborhood per call
        packs = ct.sampling_results_to_batches(df)
        if 0 not in packs:
            continue
        pack = packs[0]
        # seeds first in the map: re-order so batch seeds lead
        vmap = list(pack["map"])
        seed_set = set(int(s) for s in batch_seeds)
        lead = [v for v in vmap if v in seed_set]
        rest = [v for v in vmap if v not in seed_set]
        reorder = {v: i for i, v in enumerate(lead + rest)}
        remap = np.array([reorder[v] for v in vmap])
        pack = {
            "map": np.array(lead + rest),
            "hops": [_remap_hop(h, remap, len(vmap)) for h in pack["hops"]],
        }
        b = batch_from_sampling(pack, pad_vertices=pad_v, pad_edges=pad_e,
                                num_seeds=len(lead))
        if features is not None:
            x = np.zeros((b.g.pad_v, features.shape[1]), np.float32)
            gid = np.asarray(b.global_ids)
            valid = gid >= 0
            x[valid] = features[gid[valid]]
            yield b, jnp.asarray(x)
        else:
            yield b, None


def _remap_hop(hop, remap, n_local):
    """Rebuild one hop's CSR consistently after the seed-first reordering."""
    offs, idx = hop["offsets"], hop["indices"]
    s = np.repeat(np.arange(n_local), np.diff(offs))
    s2 = remap[s]
    order = np.argsort(s2, kind="stable")
    counts = np.bincount(s2, minlength=n_local)
    out_offs = np.zeros(n_local + 1, np.int64)
    np.cumsum(counts, out=out_offs[1:])
    w = hop.get("weight")
    return {
        "offsets": out_offs,
        "indices": remap[idx][order],
        "weight": w[order] if w is not None else None,
    }


def sage_minibatch_forward(params, batch: SampledBatch, x: jax.Array):
    """GraphSAGE forward over a sampled batch; returns seed-row logits."""
    from cugraph_tpu.nn.models import graphsage_apply

    logits = graphsage_apply(params, batch.g, x)
    return logits  # caller selects rows via batch.seed_mask
