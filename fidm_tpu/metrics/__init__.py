from .fid import (
    InceptionFeatureExtractor,
    RandomConvFeatureExtractor,
    compute_statistics,
    fid_between_image_sets,
    fid_from_features,
    frechet_distance,
    kid_from_features,
    polynomial_mmd2,
)
from .inception import convert_torch_inception_weights
from .lpips import LPIPS
from .ssim import masked_psnr, masked_ssim, psnr, ssim
