from rankaae_tpu.models.registry import AE_FORMS, build_autoencoder, build_discriminator  # noqa: F401
from rankaae_tpu.models.encoders import Encoder, CompactEncoder, QvecEncoder, FCEncoder  # noqa: F401
from rankaae_tpu.models.decoders import Decoder, CompactDecoder, QvecDecoder, FCDecoder  # noqa: F401
from rankaae_tpu.models.discriminators import DiscriminatorCNN, DiscriminatorFC  # noqa: F401
from rankaae_tpu.models.grl import grad_reverse  # noqa: F401
