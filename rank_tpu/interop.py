"""Import reference PyTorch checkpoints into rank_tpu flax params.

The reference ships two trained checkpoints
(``algorithm/DCN/model_dir/best_model.pth``,
``algorithm/DeepCrossing/model_dir/best_model.pth``). A user migrating to
rank_tpu can warm-start from them: every tensor the reference actually
trained (embedding tables, the DCN MLP tower, the output layer) is mapped
onto the matching flax param; layers the reference created fresh inside
``forward`` and therefore never trained or saved (DCN cross weights,
``cross_layer.py:16-20``; DeepCrossing residual units,
``deepcrossing.py:37-39``) keep their fresh initialisation here — they do
not exist in the checkpoint at all.

torch Linear kernels are (out, in) and flax kernels (in, out); transposed
on import. torch embedding rows map 1:1 (both sides use the +1-OOV-row
table layout, ``deepfm.py:80-86``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

REFERENCE_FIELDS = (
    "userid", "device", "authorid", "bgm_song_id", "bgm_singer_id",
    "manual_tag_list",
)


def _set_path(
    params: Dict,
    path: Tuple[str, ...],
    value: np.ndarray,
    table_padding: Dict[str, Tuple[int, int]] | None = None,
) -> None:
    node = params
    for key in path[:-1]:
        node = node[key]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(f"no flax param at {'/'.join(path)}")
    have = tuple(np.shape(node[leaf]))
    want = tuple(value.shape)
    if have != want:
        # A row deficit is acceptable ONLY when it is exactly the mesh
        # padding the Trainer applied (features.padded_for_table_sharding):
        # the caller passes its table_padding map {feature: (orig, padded)}
        # and we zero-fill only when the checkpoint has the original row
        # count and the flax table the known padded one. Any other deficit
        # (e.g. a checkpoint built against a smaller vocab file) would make
        # REACHABLE ids silently untrained — fail loudly instead.
        feature = path[-2][len("table_"):] if path[-2].startswith("table_") else path[-2]
        known = (table_padding or {}).get(feature)
        if (
            leaf == "embedding"
            and have[1:] == want[1:]
            and known is not None
            and (want[0], have[0]) == known
        ):
            value = np.concatenate(
                [value, np.zeros((have[0] - want[0],) + want[1:], value.dtype)],
                axis=0,
            )
        else:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: flax {have} vs import "
                f"{want}"
                + (
                    ""
                    if known is None
                    else f" (known mesh padding for {feature!r} is {known})"
                )
            )
    import jax.numpy as jnp

    node[leaf] = jnp.asarray(value, jnp.float32)


def reference_mapping(model_name: str) -> Dict[str, Tuple[Tuple[str, ...], bool]]:
    """ref state_dict key -> (flax param path, transpose?)."""
    mapping: Dict[str, Tuple[Tuple[str, ...], bool]] = {}
    for f in REFERENCE_FIELDS:
        mapping[f"embeddings.{f}.weight"] = (
            ("tables", f"table_{f}", "embedding"), False
        )
    if model_name == "dcn":
        for i, li in enumerate((0, 2, 4)):  # torch Sequential Linear slots
            mapping[f"dnn.{li}.weight"] = (("dnn", f"Dense_{i}", "kernel"), True)
            mapping[f"dnn.{li}.bias"] = (("dnn", f"Dense_{i}", "bias"), False)
        mapping["output_layer.weight"] = (("output", "kernel"), True)
        mapping["output_layer.bias"] = (("output", "bias"), False)
    elif model_name == "deepcrossing":
        mapping["output_layer.weight"] = (("output", "kernel"), True)
        mapping["output_layer.bias"] = (("output", "bias"), False)
    else:
        raise ValueError(
            f"no reference checkpoint mapping for {model_name!r}; the "
            "reference ships .pth files for dcn and deepcrossing only"
        )
    return mapping


def import_reference_checkpoint(
    path: str,
    model_name: str,
    params: Dict,
    table_padding: Dict[str, Tuple[int, int]] | None = None,
) -> Tuple[Dict, Dict[str, str]]:
    """Load a reference ``best_model.pth`` and copy its tensors into a
    flax ``params`` tree (mutated copy returned). Returns
    (params, report) where report maps every checkpoint tensor to the
    flax path it landed on. Raises if any checkpoint tensor has no home
    or a shape mismatch — a silent partial import would be worse than an
    error.

    ``table_padding`` is the Trainer's {feature: (orig_rows, padded_rows)}
    map; pass ``trainer.table_padding`` when importing into a
    table-sharded run so the mesh-padded tables accept the unpadded
    checkpoint rows (padding rows are unreachable ids, zero-filled). Any
    row deficit NOT matching that map raises."""
    import copy

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    mapping = reference_mapping(model_name)
    unmapped = set(sd) - set(mapping)
    if unmapped:
        raise ValueError(f"checkpoint tensors with no flax home: {sorted(unmapped)}")
    params = copy.deepcopy(params)
    report: Dict[str, str] = {}
    for ref_key, (flax_path, transpose) in mapping.items():
        if ref_key not in sd:
            continue  # mapping is a superset for models with optional parts
        t = sd[ref_key].numpy()
        if transpose:
            t = t.T
        _set_path(params, flax_path, t, table_padding)
        report[ref_key] = "/".join(flax_path)
    return params, report
