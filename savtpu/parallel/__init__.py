from .partition import partition_elements, dual_graph
from .halo import PartitionMaps, build_partition_maps
from .sharded import ShardedProblem, make_device_mesh

__all__ = [
    "partition_elements",
    "dual_graph",
    "PartitionMaps",
    "build_partition_maps",
    "ShardedProblem",
    "make_device_mesh",
]
