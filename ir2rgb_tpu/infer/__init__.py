from .export import (
    ExportedStream,
    export_multistream_artifact,
    export_serving_artifact,
    load_multistream_artifact,
    load_serving_artifact,
)
from .features import (
    collect_dataset_features,
    kmeans,
    load_clusters,
    sample_feature_map,
    save_clusters,
)
from .metrics import flicker, psnr, ssim
from .multistream import MultiStreamServer
from .stream import (
    StreamingGenerator,
    label2im,
    single_frame_infer,
    tensor2im,
    translate_clip,
)

__all__ = ["StreamingGenerator", "MultiStreamServer", "single_frame_infer",
           "translate_clip", "tensor2im", "label2im", "psnr", "ssim", "flicker",
           "export_serving_artifact", "load_serving_artifact",
           "export_multistream_artifact", "load_multistream_artifact",
           "ExportedStream", "collect_dataset_features", "kmeans",
           "save_clusters", "load_clusters", "sample_feature_map"]
