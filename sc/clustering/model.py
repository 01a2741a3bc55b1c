"""Shim for ``sc.clustering.model`` — the model zoo under reference names.

These are Flax modules (``apply``-style), not torch ``nn.Module``s; see
``rankaae_tpu.models`` for call conventions and
``rankaae_tpu.utils.torch_import`` to migrate pickled reference checkpoints.
"""
from rankaae_tpu.models.blocks import DecodingBlock, EncodingBlock  # noqa: F401
from rankaae_tpu.models.decoders import (  # noqa: F401
    CompactDecoder,
    Decoder,
    FCDecoder,
    QvecDecoder,
)
from rankaae_tpu.models.discriminators import (  # noqa: F401
    DiscriminatorCNN,
    DiscriminatorFC,
)
from rankaae_tpu.models.encoders import (  # noqa: F401
    CompactEncoder,
    Encoder,
    FCEncoder,
    QvecEncoder,
)
from rankaae_tpu.models.grl import grad_reverse as GradientReversalLayer  # noqa: F401
from rankaae_tpu.models.primitives import gaussian_smooth_1d as GaussianSmoothing  # noqa: F401
from rankaae_tpu.models.registry import DualAAE as DummyDualAAE  # noqa: F401
