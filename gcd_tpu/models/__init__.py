from gcd_tpu.models import layers, attention, video_attention, resblock
from gcd_tpu.models.unet import VideoUNet
from gcd_tpu.models import vae
from gcd_tpu.models.vae import (
    Encoder,
    Decoder,
    VideoDecoder,
    AutoencodingEngine,
    AutoencoderKL,
    AutoencoderKLModeOnly,
    DiagonalGaussianRegularizer,
)

try:
    from gcd_tpu.models import embedders  # noqa: F401
except ImportError:
    pass
try:
    from gcd_tpu.models import clip  # noqa: F401
except ImportError:
    pass
from gcd_tpu.models import vq  # noqa: F401
from gcd_tpu.models import discriminator  # noqa: F401
from gcd_tpu.models import lpips  # noqa: F401
from gcd_tpu.models import inception  # noqa: F401
