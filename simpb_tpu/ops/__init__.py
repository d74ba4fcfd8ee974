from .format import SpatialShapes, pack_feature_maps, unpack_feature_maps  # noqa: F401
from .sampling import bilinear_sample, deformable_aggregation, msda  # noqa: F401
