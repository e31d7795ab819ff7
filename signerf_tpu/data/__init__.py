from signerf_tpu.data.dataparser import (
    DataparserOutputs,
    SIGNeRFDataParserConfig,
    parse_transforms,
    transform_poses_to_original_space,
)

__all__ = [
    "DataparserOutputs",
    "SIGNeRFDataParserConfig",
    "parse_transforms",
    "transform_poses_to_original_space",
]
