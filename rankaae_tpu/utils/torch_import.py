"""Import reference PyTorch checkpoints into rankaae_tpu bundles.

The reference saves whole pickled ``nn.Module`` objects keyed
"Encoder"/"Decoder"/"Style Discriminator" (``sc/clustering/trainer.py:281-283``).
This converter maps the FC-family modules (the form every shipped config and
committed fixture uses) onto our Flax parameter pytrees, giving users a
migration path for existing trained models — and giving the test suite
golden-weight parity against the reference's committed 1500-epoch fixture
runs.

torch is imported lazily; this module is optional at runtime.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from rankaae_tpu.utils.config import TrainConfig


def _t2n(t) -> np.ndarray:
    # np.array, not asarray: for an f32 tensor .numpy() shares memory with
    # the live torch storage, and a later in-place torch mutation (an
    # optimizer step, a train-mode BN forward) would silently change the
    # "converted" weights.  Always materialize an owned copy.
    return np.array(t.detach().cpu().numpy(), dtype=np.float32)


def _convert_fc_stack(seq, n_layers: int, final_bn: bool):
    """torch Sequential([Linear, PReLU, BN, Dropout] * (n-1) + [Linear(, BN)])
    -> (params, batch_stats) dicts in our FCEncoder/FCDecoder naming."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    idx = 0
    for i in range(n_layers - 1):
        lin, prelu, bn = seq[idx], seq[idx + 1], seq[idx + 2]
        params[f"lin{i}"] = {"kernel": _t2n(lin.weight).T, "bias": _t2n(lin.bias)}
        params[f"prelu{i}"] = {"alpha": _t2n(prelu.weight)}
        stats[f"bn{i}"] = {
            "mean": _t2n(bn.running_mean), "var": _t2n(bn.running_var)
        }
        idx += 4
    lin = seq[idx]
    params["lin_out"] = {"kernel": _t2n(lin.weight).T, "bias": _t2n(lin.bias)}
    if final_bn:
        bn = seq[idx + 1]
        stats["bn_style"] = {
            "mean": _t2n(bn.running_mean), "var": _t2n(bn.running_var)
        }
    return params, stats


def _convert_fc_discriminator(dis):
    """torch Sequential([Linear, PReLU, Dropout] * (layers-1) + [Linear(->1)]).

    Returns (params, n_layers), or (None, default) when the pickled module
    predates the current reference code (the committed fixtures carry an
    older variant with BatchNorm + a 2-class Softmax head that the current
    reference ``DiscriminatorFC`` itself cannot represent).  The report
    layer never touches the discriminator, so conversion is best-effort.
    """
    import torch.nn as tnn

    seq = dis.main
    params: Dict[str, Any] = {}
    i = 0
    idx = 0
    try:
        while idx < len(seq) - 1:
            if not (isinstance(seq[idx], tnn.Linear)
                    and isinstance(seq[idx + 1], tnn.PReLU)
                    and isinstance(seq[idx + 2], tnn.Dropout)):
                return None, 3
            params[f"lin{i}"] = {
                "kernel": _t2n(seq[idx].weight).T, "bias": _t2n(seq[idx].bias)
            }
            params[f"prelu{i}"] = {"alpha": _t2n(seq[idx + 1].weight)}
            idx += 3
            i += 1
        last = seq[idx]
        if not (isinstance(last, tnn.Linear) and last.out_features == 1):
            return None, 3
        params["lin_out"] = {"kernel": _t2n(last.weight).T, "bias": _t2n(last.bias)}
    except (AttributeError, IndexError):
        return None, 3
    return params, i + 1


def _count_fc_layers(seq) -> int:
    import torch.nn as tnn

    return sum(1 for m in seq if isinstance(m, tnn.Linear))


def _conv_params(tconv):
    return {"weight": _t2n(tconv.weight), "bias": _t2n(tconv.bias)}


def _linear_params(tlin):
    return {"kernel": _t2n(tlin.weight).T, "bias": _t2n(tlin.bias)}


def _prelu_params(tprelu):
    return {"alpha": _t2n(tprelu.weight)}


def _bn_stats(tbn):
    return {"mean": _t2n(tbn.running_mean), "var": _t2n(tbn.running_var)}


def _convert_coding_block(tblock):
    """Reference EncodingBlock/DecodingBlock -> (params, stats) in our
    blocks' naming (``rankaae_tpu.models.blocks``)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if tblock.bn1 is not None:
        stats["bn1"] = _bn_stats(tblock.bn1)
    params["conv1"] = _conv_params(tblock.conv1)
    params["relu1"] = _prelu_params(tblock.relu1)
    stats["bn2"] = _bn_stats(tblock.bn2)
    params["conv2"] = _conv_params(tblock.conv2)
    params["relu2"] = _prelu_params(tblock.relu2)
    if tblock.conv_short is not None:
        params["conv_short"] = _conv_params(tblock.conv_short)
        params["relu_short"] = _prelu_params(tblock.relu_short)
    params["fc1"] = _linear_params(tblock.fc1)
    params["relu_excit_1"] = _prelu_params(tblock.relu_excit_1)
    params["fc2"] = _linear_params(tblock.fc2)
    params["relu_excit_2"] = _prelu_params(tblock.relu_excit_2)
    if tblock.conv_excit is not None:
        stats["bn_excit"] = _bn_stats(tblock.bn_excit)
        params["conv_excit"] = _conv_params(tblock.conv_excit)
        params["relu_excit_3"] = _prelu_params(tblock.relu_excit_3)
    return params, stats


def _convert_conv_encoder(enc):
    """Reference Encoder/CompactEncoder -> our params/stats naming."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, tblock in enumerate(enc.main):
        p, st = _convert_coding_block(tblock)
        params[f"block{i}"] = p
        stats[f"block{i}"] = st
    params["lin3"] = _linear_params(enc.lin3)
    stats["bn_style"] = _bn_stats(enc.bn_style)
    nstyle = enc.lin3.out_features
    return params, stats, nstyle


def _convert_conv_decoder(dec):
    """Reference Decoder/CompactDecoder -> our params/stats naming.

    The torch module is one Sequential of DecodingBlocks, EncodingBlocks,
    a BatchNorm1d, a 1x1 Conv1d and the activation; ours names them
    dblock<i>/eblock<i>/bn_out/conv_out.
    """
    import torch.nn as tnn

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    d = e = 0
    act_name = "ReLu"
    for m in dec.main:
        cls = m.__class__.__name__
        if cls == "DecodingBlock":
            p, st = _convert_coding_block(m)
            params[f"dblock{d}"] = p
            stats[f"dblock{d}"] = st
            d += 1
        elif cls == "EncodingBlock":
            p, st = _convert_coding_block(m)
            params[f"eblock{e}"] = p
            stats[f"eblock{e}"] = st
            e += 1
        elif isinstance(m, tnn.BatchNorm1d):
            stats["bn_out"] = _bn_stats(m)
        elif isinstance(m, tnn.Conv1d):
            params["conv_out"] = _conv_params(m)
        elif cls == "Softplus":
            act_name = "Softplus"
    return params, stats, act_name


def convert_reference_model(model: Dict[str, Any]) -> Tuple[Dict, Dict, TrainConfig]:
    """Convert a loaded reference checkpoint dict into
    (params, batch_stats, cfg) in our format.  Supports the FC family (the
    shipped configuration and all committed fixtures) and the conv
    "normal"/"compact" families."""
    import torch.nn as tnn

    enc, dec = model["Encoder"], model["Decoder"]
    dis = model.get("Style Discriminator")

    enc_cls = enc.__class__.__name__
    if enc_cls in ("Encoder", "CompactEncoder"):
        enc_params, enc_stats, nstyle = _convert_conv_encoder(enc)
        dec_params, dec_stats, act = _convert_conv_decoder(dec)
        dis_params: Dict[str, Any] = {}
        fc_dis_layers = 3
        if dis is not None and dis.__class__.__name__ == "DiscriminatorFC":
            converted, layers = _convert_fc_discriminator(dis)
            if converted is not None:
                dis_params, fc_dis_layers = converted, layers
        cfg = TrainConfig(
            ae_form="normal" if enc_cls == "Encoder" else "compact",
            nstyle=nstyle,
            n_aux=min(5, nstyle),
            dim_in=256, dim_out=256,
            decoder_activation=act,
            FC_discriminator_layers=fc_dis_layers,
            use_cnn_discriminator=False,
        )
        return (
            {"enc": enc_params, "dec": dec_params, "dis": dis_params},
            {"enc": enc_stats, "dec": dec_stats, "dis": {}},
            cfg,
        )

    if enc_cls != "FCEncoder":
        raise NotImplementedError(
            f"converter supports the FC and conv families; got {enc_cls}"
        )

    n_layers = _count_fc_layers(enc.main)
    dim_in = enc.main[0].in_features
    nstyle = [m for m in enc.main if isinstance(m, tnn.Linear)][-1].out_features
    dim_out = [m for m in dec.main if isinstance(m, tnn.Linear)][-1].out_features
    last_act = dec.main[-1].__class__.__name__
    decoder_activation = "Softplus" if last_act == "Softplus" else "ReLu"

    enc_params, enc_stats = _convert_fc_stack(enc.main, n_layers, final_bn=True)
    dec_params, dec_stats = _convert_fc_stack(dec.main, n_layers, final_bn=False)

    dis_params: Dict[str, Any] = {}
    fc_dis_layers = 3
    if dis is not None and dis.__class__.__name__ == "DiscriminatorFC":
        converted, layers = _convert_fc_discriminator(dis)
        if converted is not None:
            dis_params, fc_dis_layers = converted, layers

    cfg = TrainConfig(
        ae_form="FC",
        nstyle=nstyle,
        n_aux=min(5, nstyle),
        dim_in=dim_in,
        dim_out=dim_out,
        n_layers=n_layers,
        decoder_activation=decoder_activation,
        FC_discriminator_layers=fc_dis_layers,
        use_cnn_discriminator=False,
    )
    params = {"enc": enc_params, "dec": dec_params, "dis": dis_params}
    batch_stats = {"enc": enc_stats, "dec": dec_stats, "dis": {}}
    return params, batch_stats, cfg


def import_reference_checkpoint(pt_path: str, out_path: str | None = None):
    """Load a reference ``final.pt`` (requires /root/reference on sys.path
    for unpickling) and optionally save it as one of our bundles."""
    import torch

    model = torch.load(pt_path, map_location="cpu", weights_only=False)
    params, batch_stats, cfg = convert_reference_model(model)
    if out_path is not None:
        from rankaae_tpu.utils.checkpoint import save_model_bundle

        save_model_bundle(out_path, params, batch_stats, cfg,
                          extra={"imported_from": pt_path})
    return params, batch_stats, cfg
