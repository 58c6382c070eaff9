"""Keras .h5 checkpoint import: reference-trained weights -> flax variables.

The reference saves/loads Keras-2 legacy HDF5 weight files
(``model.load_weights(NAME + '.h5')``, reference: eval.py:63-65;
get_csv_data.py:80-102 re-evaluates ``.h5``/``_SWA.h5``/``_sample.h5``
trios). This module reads that format with h5py and maps the weights onto
the challenge_tpu flax module tree so reference-trained checkpoints can be
evaluated (or fine-tuned) in this framework.

Mapping rules (vad CRNN family, reference: sj_train.py:214-255):

* layers stream in build order on both sides; units are matched
  sequentially (the reference's Keras layer order is mirrored by
  ``VADModel.__call__``'s module order);
* Keras Conv2D kernels are [kh, kw, in, out] and Dense kernels [in, out] —
  identical to flax, no transposition;
* Keras BatchNormalization [gamma, beta, moving_mean, moving_var] map to
  flax params {scale, bias} + batch_stats {mean, var};
* the reference's conv/dense BIAS before BatchNorm is dropped (our layers
  are bias-free there) and **folded into the following BN's moving mean**:
  our pre-BN activation is the reference's minus the bias, so
  ``mean_ours = moving_mean - bias`` reproduces the reference's normalized
  output exactly (BN subtracts the mean; see NOTES.md on the bias-inert
  rewrite);
* unsupported layouts (recurrent layers, i.e. vad v9's BiLSTM, or non-vad
  families for now) raise with a clear message instead of mis-mapping.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- h5 parsing
def read_keras_h5(path: str) -> List[Tuple[str, List[np.ndarray]]]:
    """Read a Keras-2 legacy HDF5 weight file into an ordered list of
    (layer_name, [weight arrays]) for layers that have weights."""
    import h5py

    with h5py.File(path, 'r') as f:
        root = f['model_weights'] if 'model_weights' in f else f
        if 'layer_names' not in root.attrs:
            raise ValueError(
                f'{path!r} is not a Keras legacy HDF5 weight file '
                '(no layer_names attribute)')
        layers = []
        for lname in root.attrs['layer_names']:
            lname = lname.decode() if isinstance(lname, bytes) else str(lname)
            g = root[lname]
            wnames = [n.decode() if isinstance(n, bytes) else str(n)
                      for n in g.attrs.get('weight_names', [])]
            if not wnames:
                continue
            layers.append((lname, [np.asarray(g[n]) for n in wnames]))
    return layers


def export_keras_legacy_h5(model, path: str) -> None:
    """Write a Keras model's weights in the Keras-2 legacy HDF5 layout
    (root attrs ``layer_names``, per-layer attrs ``weight_names``) — the
    format reference-era checkpoints are in. Used to produce test fixtures
    and to hand weights back to reference tooling."""
    import h5py

    with h5py.File(path, 'w') as f:
        names = []
        for layer in model.layers:
            weights = layer.get_weights()
            if not weights:
                continue
            names.append(layer.name)
            g = f.create_group(layer.name)
            wnames = []
            for i, w in enumerate(weights):
                wn = f'{layer.name}/weight_{i}:0'
                g.create_dataset(wn, data=np.asarray(w))
                wnames.append(wn.encode())
            g.attrs['weight_names'] = wnames
        f.attrs['layer_names'] = [n.encode() for n in names]


# ------------------------------------------------------------ unit streams
def _classify(layer_name: str, arrays: List[np.ndarray]) -> Tuple[str, list]:
    """Classify one Keras weight group by shape arity (names are only used
    in error messages, so files from any Keras version parse)."""
    dims = [a.ndim for a in arrays]
    if dims == [4, 1]:
        return 'conv', arrays
    if dims == [2, 1]:
        return 'dense', arrays
    if len(arrays) == 4 and all(d == 1 for d in dims):
        return 'bn', arrays
    raise NotImplementedError(
        f'unsupported Keras layer {layer_name!r} with weight shapes '
        f'{[a.shape for a in arrays]} (recurrent/custom layers are not '
        'importable yet)')


def _vad_unit_plan(v: int) -> List[Tuple[str, str]]:
    """Ordered (kind, flax_prefix) units mirroring VADModel.__call__
    (models/vad.py) == the reference's define_keras_model layer order.
    kind: 'conv_bn' | 'dense' | 'dense_bn'."""
    if v == 9:
        raise NotImplementedError(
            'vad v9 contains a BiLSTM; Keras->flax LSTM gate-order mapping '
            'is not implemented')
    units: List[Tuple[str, str]] = []
    for j in range(2):
        units.append(('conv_bn', f'ConvMPBlock_0/Conv_{j}'))
    top = 0
    for i in range(1, 5):
        if v == 7:
            for _ in range(3):
                units.append(('conv_bn', f'Conv_{top}'))
                top += 1
        for j in range(3):
            units.append(('conv_bn', f'ConvMPBlock_{i}/Conv_{j}'))
    units.append(('dense', 'Dense_0'))          # TimeDistributed Dense
    for k, _nodes in enumerate((256, 128, 64)):
        units.append(('dense_bn', f'FullyConnectedLayer_{k}/Dense_0'))
    units.append(('dense', 'FullyConnectedLayer_3/Dense_0'))
    return units


def _bn_prefix(core_prefix: str) -> str:
    """Flax path of the BatchNorm following a conv/dense at core_prefix:
    same parent module, same index, BatchNorm_<j>/BatchNorm_0."""
    parent, _, leaf = core_prefix.rpartition('/')
    idx = leaf.rsplit('_', 1)[1]
    bn = f'BatchNorm_{idx}/BatchNorm_0'
    return f'{parent}/{bn}' if parent else bn


# ---------------------------------------------------------------- importer
def load_keras_h5_variables(bundle, path: str):
    """Read a reference Keras .h5 checkpoint and return flax ``variables``
    ({'params', 'batch_stats'}) for ``bundle`` (a ModelBundle). Shapes are
    validated leaf-by-leaf against the module's own initialization."""
    config = bundle.config
    if config.model_type != 'vad':
        raise NotImplementedError(
            f'Keras .h5 import currently supports the vad family only '
            f'(got model_type={config.model_type!r})')
    plan = _vad_unit_plan(config.v)
    groups = [(_classify(n, a)[0], n, a) for n, a in read_keras_h5(path)]

    params: dict = {}
    stats: dict = {}

    def put(tree, prefix, leaf, value):
        node = tree
        for part in prefix.split('/'):
            node = node.setdefault(part, {})
        node[leaf] = jnp.asarray(value, jnp.float32)

    gi = 0

    def next_group(expect_kind, unit_prefix):
        nonlocal gi
        if gi >= len(groups):
            raise ValueError(
                f'{path!r}: ran out of weight groups at unit '
                f'{unit_prefix!r} — not a {config.model_type} v{config.v} '
                'checkpoint?')
        kind, name, arrays = groups[gi]
        gi += 1
        if kind != expect_kind:
            raise ValueError(
                f'{path!r}: expected a {expect_kind} layer for unit '
                f'{unit_prefix!r}, found {kind} ({name!r})')
        return name, arrays

    for kind, prefix in plan:
        if kind == 'dense':
            _, (kernel, bias) = next_group('dense', prefix)
            put(params, prefix, 'kernel', kernel)
            put(params, prefix, 'bias', bias)
            continue
        core_kind = 'conv' if kind == 'conv_bn' else 'dense'
        _, core = next_group(core_kind, prefix)
        kernel, bias = core if len(core) == 2 else (core[0], None)
        _, (gamma, beta, mmean, mvar) = next_group('bn', prefix)
        put(params, prefix, 'kernel', kernel)
        bnp = _bn_prefix(prefix)
        put(params, bnp, 'scale', gamma)
        put(params, bnp, 'bias', beta)
        # fold the dropped pre-BN bias into the moving mean (exact)
        put(stats, bnp, 'mean', mmean if bias is None else mmean - bias)
        put(stats, bnp, 'var', mvar)

    if gi != len(groups):
        extra = [n for _, n, _ in groups[gi:]]
        raise ValueError(
            f'{path!r}: {len(extra)} unconsumed weight group(s) {extra} — '
            f'not a {config.model_type} v{config.v} checkpoint?')

    variables = {'params': params, 'batch_stats': stats}

    # leaf-by-leaf shape validation against the module's own init
    import jax
    template = bundle.init(jax.random.PRNGKey(0))
    t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    v_flat = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    if len(v_flat) != len(t_leaves):
        raise ValueError(
            f'{path!r}: imported tree has {len(v_flat)} leaves, model '
            f'expects {len(t_leaves)}')
    for tpath, tleaf in t_leaves:
        if tpath not in v_flat:
            raise ValueError(f'{path!r}: missing imported leaf {tpath}')
        if v_flat[tpath].shape != tleaf.shape:
            raise ValueError(
                f'{path!r}: shape mismatch at {tpath}: '
                f'{v_flat[tpath].shape} vs model {tleaf.shape}')
    return variables
