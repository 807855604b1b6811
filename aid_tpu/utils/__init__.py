from aid_tpu.utils.images import (
    image_grids,
    load_and_process_images,
    save_image,
    show_images_horizontally,
    to_pil,
)
from aid_tpu.utils.profiling import PhaseTimer, trace
from aid_tpu.utils.tokenizer import CLIPBPETokenizer, HashTokenizer, load_tokenizer

__all__ = [
    "image_grids",
    "load_and_process_images",
    "save_image",
    "show_images_horizontally",
    "to_pil",
    "PhaseTimer",
    "trace",
    "CLIPBPETokenizer",
    "HashTokenizer",
    "load_tokenizer",
]
