from gcd_tpu.diffusion.scaling import (
    EDMScaling,
    EpsScaling,
    VScaling,
    VScalingWithEDMcNoise,
    DumbScaling,
)
from gcd_tpu.diffusion.discretization import (
    EDMDiscretization,
    LegacyDDPMDiscretization,
)
from gcd_tpu.diffusion.sigma_sampling import EDMSampling, DiscreteSampling
from gcd_tpu.diffusion.weighting import (
    UnitWeighting,
    EDMWeighting,
    VWeighting,
    EpsWeighting,
)
from gcd_tpu.diffusion.denoiser import Denoiser, DiscreteDenoiser
from gcd_tpu.diffusion.guiders import (
    IdentityGuider,
    VanillaCFG,
    LinearPredictionGuider,
)
from gcd_tpu.diffusion.sampling import (
    EulerEDMSampler,
    HeunEDMSampler,
    EulerAncestralSampler,
    DPMPP2SAncestralSampler,
    DPMPP2MSampler,
    LinearMultistepSampler,
)
from gcd_tpu.diffusion.loss import StandardDiffusionLoss
