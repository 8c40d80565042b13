"""Multi-chip execution: device meshes, halo-exchange spatial sharding, and
batch data-parallelism.

The reference's only parallelism is intra-node OpenMP loops
(/root/reference/sift3d/imutil.c:799,823; sift.c:1117,1583). The TPU-native
equivalents are first-class here:

 - data parallelism: a batch of volumes sharded over a mesh axis runs the
   UNROLLED single-volume fused program per device under shard_map —
   pipeline.SIFT3D.detect_keypoints_batch (the production path);
 - spatial ("context") parallelism: one large volume sharded along z, with
   halo exchange (ppermute) feeding the banded-matmul blur and the extrema
   stencil — the volumetric analogue of sequence/context parallelism
   (spatial.ShardedSIFT3D);
 - keypoint parallelism: orientation/descriptor batches sharded over the
   keypoint axis.
"""

from .halo import sharded_blur_z
from .mesh import make_mesh

__all__ = ["make_mesh", "sharded_blur_z"]
