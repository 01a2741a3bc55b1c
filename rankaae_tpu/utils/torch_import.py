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
    return np.asarray(t.detach().cpu().numpy(), np.float32)


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


def convert_reference_model(model: Dict[str, Any]) -> Tuple[Dict, Dict, TrainConfig]:
    """Convert a loaded reference checkpoint dict into
    (params, batch_stats, cfg) in our format.  FC family only (the shipped
    configuration; conv forms can be added on demand)."""
    import torch.nn as tnn

    enc, dec = model["Encoder"], model["Decoder"]
    dis = model.get("Style Discriminator")

    if enc.__class__.__name__ != "FCEncoder":
        raise NotImplementedError(
            f"converter supports the FC family; got {enc.__class__.__name__}"
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
