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
    remat = getattr(cfg, "remat", False)
    encoder = enc_cls(
        nstyle=cfg.nstyle,
        dropout_rate=cfg.dropout_rate,
        dim_in=cfg.dim_in,
        n_layers=cfg.n_layers,
        remat=remat,
    )
    decoder = dec_cls(
        nstyle=cfg.nstyle,
        dropout_rate=cfg.dropout_rate,
        last_layer_activation=cfg.decoder_activation,
        dim_out=cfg.dim_out,
        n_layers=cfg.n_layers,
        remat=remat,
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


class DualAAE:
    """Composition of encoder + decoder + discriminator with a single
    forward, analog of the reference's ``DummyDualAAE``
    (``sc/clustering/model.py:665-676``): returns (reconstruction,
    discriminator output on the latent with beta=0.3)."""

    def __init__(self, use_cnn_dis: bool, cls_encoder, cls_decoder):
        self.encoder = cls_encoder()
        self.decoder = cls_decoder()
        self.discriminator = (DiscriminatorCNN() if use_cnn_dis
                              else DiscriminatorFC())

    def init(self, rngs, x):
        import jax.numpy as jnp

        ev = self.encoder.init(rngs, x, train=True)
        z = self.encoder.apply(ev, x, train=False)
        dv = self.decoder.init(rngs, z, train=True)
        xv = self.discriminator.init(rngs, z, jnp.float32(0.3), train=True)
        return {"enc": ev, "dec": dv, "dis": xv}

    def apply(self, variables, x):
        import jax.numpy as jnp

        z = self.encoder.apply(variables["enc"], x, train=False)
        x2 = self.decoder.apply(variables["dec"], z, train=False)
        is_gau = self.discriminator.apply(
            variables["dis"], z, jnp.float32(0.3), train=False
        )
        return x2, is_gau
