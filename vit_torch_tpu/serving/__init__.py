from vit_torch_tpu.data.datasets import resize_images
from vit_torch_tpu.serving.export import (
    ServingModel, export_classifier, export_detector, letterbox_images,
    load_bundle, save_bundle)

__all__ = ["ServingModel", "export_classifier", "export_detector",
           "letterbox_images", "load_bundle", "resize_images",
           "save_bundle"]
