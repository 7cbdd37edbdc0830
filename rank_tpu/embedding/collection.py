"""Per-field embedding collection.

Replaces the per-model ``nn.Embedding`` dicts (``algorithm/DIN/
din.py:251-260``, ``dcn.py:130-137``, ``bst.py:181-189``, ...) with one
module driven by the FeatureSchema. Preserves reference semantics:

  * vocab sizes include the OOV slot at row 0 (deepfm.py:80-86);
  * per-field embedding dims (din.py:251-260 convention);
  * table sharing between a categorical feature and a sequence feature
    (DIN's target ``feedid`` and ``his_read_comment_7d_seq`` share one
    table in spirit — the reference actually allocates two tables over the
    same vocab, din.py:258-259; we expose both behaviours via
    ``shares_table_with`` in the schema, defaulting to shared which is the
    paper-standard choice).

Sharding: tables are created with a logical partitioning annotation on the
vocab axis (``nn.with_partitioning`` over the 'table' logical axis), so
under a mesh with a nontrivial 'table' axis the big tables (feedid:
106,444x16) are row-sharded and XLA/GSPMD inserts the gather collectives;
on a 1-D data mesh they are replicated. An explicit shard_map all-to-all
path lives in ``rank_tpu.embedding.sharded``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.sharding import Mesh

from ..features import FeatureSchema


def table_specs(schema: FeatureSchema) -> Dict[str, Tuple[int, int]]:
    """name -> (vocab_size, emb_dim) for each OWNED table (shared-table
    features resolve to their owner)."""
    specs: Dict[str, Tuple[int, int]] = {}
    for f in list(schema.categorical) + list(schema.sequence):
        owner = f.shares_table_with or f.name
        if owner == f.name:
            specs[f.name] = (f.vocab_size, f.emb_dim)
    return specs

# torch nn.Embedding default init is N(0, 1); that is what the reference
# models train with (fwfm re-inits xavier, fwfm.py:103-104) and it is the
# default here too: measured head-to-head on identical synthetic data,
# N(0,1) beats truncated-normal(0.02) by ~0.03 eval AUC at Adam lr 5e-3
# (CTR id embeddings need initial magnitude to differentiate quickly).
INITIALIZERS = {
    "normal": nn.initializers.normal(stddev=1.0),
    # production-CTR-style small init. N(0,1) (torch's nn.Embedding
    # default, what the reference trains with) makes SECOND-ORDER id-pair
    # learning collapse: the initial u.a dot-product noise has ~unit
    # scale per dim and three epochs of Adam at 5e-3 cannot rotate the
    # random subspaces into alignment (measured: a factorized bilinear
    # probe on the calibrated log scores 0.82 AUC with std-0.1 init vs
    # 0.48 with std-1.0 — docs/REPRODUCING.md §5f). First-order
    # memorisation, by contrast, mildly prefers the large init (~+0.03
    # on the latent-factor sampler, where embeddings act as random hash
    # features). Models whose value lies in multiplicative interactions
    # (DCN/xDeepFM/FM-family on crossing-structured data) should use
    # 'normal_small'.
    "normal_small": nn.initializers.normal(stddev=0.1),
    "truncated_normal": nn.initializers.truncated_normal(stddev=0.02),
    "xavier_uniform": nn.initializers.xavier_uniform(),
}


class EmbeddingCollection(nn.Module):
    """Owns one table per (non-shared) categorical/sequence feature.

    ``mode`` selects the lookup communication schedule on a table-sharded
    mesh (SURVEY.md §5 all-to-all ID-exchange pattern):
      * 'gspmd' (default): plain ``jnp.take``; XLA/GSPMD inserts the
        collectives from the P('table', None) param annotation.
      * 'psum' / 'alltoall': the EXPLICIT shard_map schedules from
        ``embedding.sharded`` — applied only to tables named in
        ``sharded`` (the ones the Trainer actually row-shards); the rest
        fall back to the plain gather.
    """

    schema: FeatureSchema
    init_name: str = "normal"
    # extra per-field tables with custom dims, e.g. DeepFM's dim-1
    # first-order tables: {"linear": 1} adds a parallel set of dim-1 tables.
    param_dtype: jnp.dtype = jnp.float32
    mode: str = "gspmd"
    mesh: Optional[Mesh] = None
    sharded: Tuple[str, ...] = ()

    def setup(self):
        init = INITIALIZERS[self.init_name]
        tables = {}
        for name, (vocab, dim) in table_specs(self.schema).items():
            tables[name] = nn.Embed(
                vocab,
                dim,
                embedding_init=nn.with_partitioning(init, ("table", None)),
                param_dtype=self.param_dtype,
                name=f"table_{name}",
            )
        self._tables = tables

    def _owner(self, name: str) -> str:
        for f in list(self.schema.categorical) + list(self.schema.sequence):
            if f.name == name:
                return f.shares_table_with or f.name
        raise KeyError(name)

    def lookup(self, name: str, ids: jnp.ndarray) -> jnp.ndarray:
        """ids (B,) or (B, T) -> embeddings (B, D) / (B, T, D)."""
        owner = self._owner(name)
        embed = self._tables[owner]
        if (
            self.mode == "gspmd"
            or self.mesh is None
            or owner not in self.sharded
        ):
            return embed(ids)
        from .sharded import sharded_lookup

        flat = ids.reshape(-1)
        out = sharded_lookup(
            embed.embedding, flat, self.mesh, mode=self.mode
        )
        return out.reshape(ids.shape + (out.shape[-1],))

    def __call__(self, name: str, ids: jnp.ndarray) -> jnp.ndarray:
        return self.lookup(name, ids)


# NOTE: FM-family models create their own uniform-dim (and dim-1 linear)
# tables via RankModel.uniform_tables (models/base.py); field-interaction
# models stack those uniform embeddings directly, so no pad-to-common-dim
# helper is needed here.
