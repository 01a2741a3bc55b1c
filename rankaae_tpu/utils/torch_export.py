"""Export rankaae_tpu bundles as reference PyTorch checkpoints.

The inverse of :mod:`rankaae_tpu.utils.torch_import`: writes a
``final.pt``-style dict of whole pickled reference ``nn.Module`` objects
keyed "Encoder"/"Decoder"/"Style Discriminator"
(``sc/clustering/trainer.py:281-283``), so models trained on TPU can be
consumed by the reference's own report stage and by any downstream torch
tooling users already have.  Supports the FC family (every shipped config)
and the conv "normal"/"compact" families.

Requires the reference ``sc`` package importable (its path is passed in;
the repo's import-compat ``sc`` shim is temporarily evicted from
``sys.modules`` so pickle records the genuine torch classes).
"""
from __future__ import annotations

import contextlib
import importlib
import sys
from typing import Any, Dict

import numpy as np


@contextlib.contextmanager
def _reference_model_module(sc_path: str):
    """Import the REFERENCE ``sc.clustering.model``, shadowing the repo's
    import-compat shim for the duration; evict the reference modules on exit
    so later shim imports resolve normally."""
    def _evict(pred):
        for name in list(sys.modules):
            if name == "sc" or name.startswith("sc."):
                mod = sys.modules[name]
                if pred(getattr(mod, "__file__", "") or ""):
                    del sys.modules[name]

    _evict(lambda f: sc_path not in f)        # drop the shim (or stale) sc
    # force sc_path AHEAD of any repo entry: being merely *present* on the
    # path is not enough — a later sys.path.insert(0, <repo>) elsewhere
    # would make the fresh ``import sc`` below cache the repo shim and the
    # pickled checkpoint would carry shim classes
    prior_index = sys.path.index(sc_path) if sc_path in sys.path else None
    if prior_index is not None:
        sys.path.remove(sc_path)
    sys.path.insert(0, sc_path)
    try:
        mod = importlib.import_module("sc.clustering.model")
        assert sc_path in (getattr(mod, "__file__", "") or ""), (
            f"reference sc resolution failed: got {mod.__file__}")
        yield mod
    finally:
        _evict(lambda f: sc_path in f)        # drop the reference sc again
        sys.path.remove(sc_path)
        if prior_index is not None:
            sys.path.insert(min(prior_index, len(sys.path)), sc_path)


def _copy(dst_tensor, arr: np.ndarray) -> None:
    import torch

    src = torch.from_numpy(np.array(arr, dtype=np.float32, copy=True))
    if tuple(dst_tensor.shape) != tuple(src.shape):
        raise ValueError(f"shape mismatch: torch {tuple(dst_tensor.shape)} "
                         f"vs bundle {tuple(src.shape)}")
    with torch.no_grad():
        dst_tensor.copy_(src)


def _set_linear(tlin, p) -> None:
    _copy(tlin.weight, np.asarray(p["kernel"]).T)
    _copy(tlin.bias, p["bias"])


def _set_prelu(tprelu, p) -> None:
    _copy(tprelu.weight, p["alpha"])


def _set_bn(tbn, st) -> None:
    _copy(tbn.running_mean, st["mean"])
    _copy(tbn.running_var, st["var"])


def _set_conv(tconv, p) -> None:
    _copy(tconv.weight, p["weight"])
    _copy(tconv.bias, p["bias"])


def _fill_fc_stack(seq, params: Dict[str, Any], stats: Dict[str, Any],
                   n_layers: int, final_bn: bool) -> None:
    """Reverse of ``torch_import._convert_fc_stack``."""
    idx = 0
    for i in range(n_layers - 1):
        _set_linear(seq[idx], params[f"lin{i}"])
        _set_prelu(seq[idx + 1], params[f"prelu{i}"])
        _set_bn(seq[idx + 2], stats[f"bn{i}"])
        idx += 4
    _set_linear(seq[idx], params["lin_out"])
    if final_bn:
        _set_bn(seq[idx + 1], stats["bn_style"])


def _fill_coding_block(tblock, p: Dict[str, Any], st: Dict[str, Any]) -> None:
    """Reverse of ``torch_import._convert_coding_block`` (both block kinds)."""
    if tblock.bn1 is not None:
        _set_bn(tblock.bn1, st["bn1"])
    _set_conv(tblock.conv1, p["conv1"])
    _set_prelu(tblock.relu1, p["relu1"])
    _set_bn(tblock.bn2, st["bn2"])
    _set_conv(tblock.conv2, p["conv2"])
    _set_prelu(tblock.relu2, p["relu2"])
    if tblock.conv_short is not None:
        _set_conv(tblock.conv_short, p["conv_short"])
        _set_prelu(tblock.relu_short, p["relu_short"])
    _set_linear(tblock.fc1, p["fc1"])
    _set_prelu(tblock.relu_excit_1, p["relu_excit_1"])
    _set_linear(tblock.fc2, p["fc2"])
    _set_prelu(tblock.relu_excit_2, p["relu_excit_2"])
    if tblock.conv_excit is not None:
        _set_bn(tblock.bn_excit, st["bn_excit"])
        _set_conv(tblock.conv_excit, p["conv_excit"])
        _set_prelu(tblock.relu_excit_3, p["relu_excit_3"])


def _build_torch_modules(m, params, batch_stats, cfg):
    """Construct reference modules for ``cfg`` and copy the bundle weights."""
    import torch.nn as tnn

    if cfg.ae_form == "FC":
        enc = m.FCEncoder(dropout_rate=cfg.dropout_rate, nstyle=cfg.nstyle,
                          dim_in=cfg.dim_in, n_layers=cfg.n_layers)
        dec = m.FCDecoder(dropout_rate=cfg.dropout_rate, nstyle=cfg.nstyle,
                          dim_out=cfg.dim_out,
                          last_layer_activation=cfg.decoder_activation,
                          n_layers=cfg.n_layers)
        _fill_fc_stack(enc.main, params["enc"], batch_stats["enc"],
                       cfg.n_layers, final_bn=True)
        _fill_fc_stack(dec.main, params["dec"], batch_stats["dec"],
                       cfg.n_layers, final_bn=False)
    elif cfg.ae_form in ("normal", "compact"):
        enc_cls = m.Encoder if cfg.ae_form == "normal" else m.CompactEncoder
        dec_cls = m.Decoder if cfg.ae_form == "normal" else m.CompactDecoder
        enc = enc_cls(dropout_rate=cfg.dropout_rate, nstyle=cfg.nstyle,
                      dim_in=cfg.dim_in)
        if cfg.ae_form == "normal":
            if cfg.dim_out != 256:
                raise ValueError(
                    "the reference Decoder is architecturally fixed at "
                    f"dim_out=256 (model.py:381-427); bundle has {cfg.dim_out}"
                )
            dec = dec_cls(dropout_rate=cfg.dropout_rate, nstyle=cfg.nstyle,
                          last_layer_activation=cfg.decoder_activation)
        else:
            dec = dec_cls(dropout_rate=cfg.dropout_rate, nstyle=cfg.nstyle,
                          last_layer_activation=cfg.decoder_activation,
                          dim_out=cfg.dim_out)
        for i, tblock in enumerate(enc.main):
            _fill_coding_block(tblock, params["enc"][f"block{i}"],
                               batch_stats["enc"][f"block{i}"])
        _set_linear(enc.lin3, params["enc"]["lin3"])
        _set_bn(enc.bn_style, batch_stats["enc"]["bn_style"])
        d = e = 0
        for tm in dec.main:
            cls = tm.__class__.__name__
            if cls == "DecodingBlock":
                _fill_coding_block(tm, params["dec"][f"dblock{d}"],
                                   batch_stats["dec"][f"dblock{d}"])
                d += 1
            elif cls == "EncodingBlock":
                _fill_coding_block(tm, params["dec"][f"eblock{e}"],
                                   batch_stats["dec"][f"eblock{e}"])
                e += 1
            elif isinstance(tm, tnn.BatchNorm1d):
                _set_bn(tm, batch_stats["dec"]["bn_out"])
            elif isinstance(tm, tnn.Conv1d):
                _set_conv(tm, params["dec"]["conv_out"])
    else:
        raise NotImplementedError(
            f"torch export supports the FC/normal/compact families; "
            f"got ae_form={cfg.ae_form!r} (qved has no reference-format "
            "consumer in the report stage)"
        )

    dis = None
    if params.get("dis") and cfg.use_cnn_discriminator:
        import warnings

        warnings.warn(
            "bundle uses the CNN discriminator, which the torch exporter "
            "does not map; writing Encoder/Decoder only (the reference "
            "report stage never reads the discriminator)", stacklevel=2)
    if params.get("dis") and not cfg.use_cnn_discriminator:
        dis = m.DiscriminatorFC(dropout_rate=cfg.dis_dropout_rate,
                                nstyle=cfg.nstyle, noise=cfg.dis_noise,
                                layers=cfg.FC_discriminator_layers)
        seq = dis.main
        idx = 0
        for i in range(cfg.FC_discriminator_layers - 1):
            _set_linear(seq[idx], params["dis"][f"lin{i}"])
            _set_prelu(seq[idx + 1], params["dis"][f"prelu{i}"])
            idx += 3
        _set_linear(seq[idx], params["dis"]["lin_out"])
    return enc, dec, dis


def export_reference_checkpoint(bundle_path: str, out_pt: str,
                                sc_path: str = "/root/reference") -> None:
    """Write a bundle (``final.mpk``/``best_tracked.mpk``) as a reference
    ``final.pt``: ``{"Encoder": module, "Decoder": module,
    "Style Discriminator": module}`` of genuine reference classes in eval
    mode, loadable by ``sc.report`` wherever the reference package is
    installed."""
    import torch

    from rankaae_tpu.utils.checkpoint import load_model_bundle

    params, batch_stats, cfg, _ = load_model_bundle(bundle_path)
    with _reference_model_module(sc_path) as m:
        enc, dec, dis = _build_torch_modules(m, params, batch_stats, cfg)
        out = {"Encoder": enc.eval(), "Decoder": dec.eval()}
        if dis is not None:
            out["Style Discriminator"] = dis.eval()
        torch.save(out, out_pt)
