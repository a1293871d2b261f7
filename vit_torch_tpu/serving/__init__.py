from vit_torch_tpu.serving.export import (
    ServingModel, export_classifier, export_detector, load_bundle,
    save_bundle)

__all__ = ["ServingModel", "export_classifier", "export_detector",
           "load_bundle", "save_bundle"]
