from .engine import DiffusionSampler, SamplerSpec, get_standard_sampler
from . import predictors
