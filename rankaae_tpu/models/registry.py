"""Model registry — the TPU analog of ``AE_CLS_DICT``
(reference ``sc/utils/parameter.py:14-31``)."""
from __future__ import annotations

from rankaae_tpu.models.decoders import CompactDecoder, Decoder, FCDecoder, QvecDecoder
from rankaae_tpu.models.discriminators import DiscriminatorCNN, DiscriminatorFC
from rankaae_tpu.models.encoders import CompactEncoder, Encoder, FCEncoder, QvecEncoder

AE_FORMS = {
    "normal": {"encoder": Encoder, "decoder": Decoder},
    "compact": {"encoder": CompactEncoder, "decoder": CompactDecoder},
    "qved": {"encoder": QvecEncoder, "decoder": QvecDecoder},
    "FC": {"encoder": FCEncoder, "decoder": FCDecoder},
}


def build_autoencoder(cfg):
    """Instantiate (encoder, decoder) modules from a TrainConfig
    (mirrors ``Trainer.from_data``, reference ``trainer.py:442-454``)."""
    enc_cls = AE_FORMS[cfg.ae_form]["encoder"]
    dec_cls = AE_FORMS[cfg.ae_form]["decoder"]
    encoder = enc_cls(
        nstyle=cfg.nstyle,
        dropout_rate=cfg.dropout_rate,
        dim_in=cfg.dim_in,
        n_layers=cfg.n_layers,
    )
    decoder = dec_cls(
        nstyle=cfg.nstyle,
        dropout_rate=cfg.dropout_rate,
        last_layer_activation=cfg.decoder_activation,
        dim_out=cfg.dim_out,
        n_layers=cfg.n_layers,
    )
    return encoder, decoder


def build_discriminator(cfg):
    """Instantiate the discriminator (reference ``trainer.py:455-463``)."""
    if cfg.use_cnn_discriminator:
        return DiscriminatorCNN(
            nstyle=cfg.nstyle, dropout_rate=cfg.dis_dropout_rate, noise=cfg.dis_noise
        )
    return DiscriminatorFC(
        nstyle=cfg.nstyle,
        dropout_rate=cfg.dis_dropout_rate,
        noise=cfg.dis_noise,
        layers=cfg.FC_discriminator_layers,
    )
