from arreau_tpu.models.ponita import PonitaFiberBundle, PonitaConfig, FiberBundleInputs  # noqa: F401
from arreau_tpu.models.point_cloud import (  # noqa: F401
    PonitaPointCloud,
    PointCloudConfig,
    PointCloudInputs,
)


def make_ponita(num_ori: int = 16, **kwargs):
    """Mode-dispatching convenience factory (capability parity with the
    reference's ``Ponita`` wrapper, /root/reference/ponita/models/ponita.py:17-26,
    whose positional re-signature drift this replaces with one coherent API):

      * ``num_ori > 0``  -> PonitaFiberBundle on an S^2 (or S^1) grid
      * ``num_ori == -1`` -> PonitaPointCloud with position-orientation lifting
      * ``num_ori == 0``  -> plain point-cloud PonitaPointCloud

    kwargs are the fields of PonitaConfig / PointCloudConfig respectively.
    """
    if num_ori > 0:
        return PonitaFiberBundle(PonitaConfig(num_ori=num_ori, **kwargs))
    lifted = num_ori == -1
    return PonitaPointCloud(PointCloudConfig(lifted=lifted, **kwargs))
