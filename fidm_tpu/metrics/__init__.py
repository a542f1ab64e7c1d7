from .fid import (
    RandomConvFeatureExtractor,
    compute_statistics,
    fid_between_image_sets,
    fid_from_features,
    frechet_distance,
)
from .lpips import LPIPS
from .ssim import psnr, ssim
