from .dataset import (
    DataLoader,
    InpaintingDataset,
    create_inference_dataloader,
    create_inpainting_dataloaders,
    list_images,
    load_image,
)
from .masks import load_mask, mask_from_array, random_mask
from .prefetch import ThreadedLoader, device_prefetch
from .shards import ShardReader, is_packed_dir, pack_dataset
