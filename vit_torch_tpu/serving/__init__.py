from vit_torch_tpu.data.datasets import resize_images
from vit_torch_tpu.serving.export import (
    ServingModel, export_classifier, export_detector, letterbox_images,
    load_bundle, save_bundle)
from vit_torch_tpu.serving.server import BundleServer, MicroBatcher

__all__ = ["BundleServer", "MicroBatcher", "ServingModel",
           "export_classifier", "export_detector", "letterbox_images",
           "load_bundle", "resize_images", "save_bundle"]
