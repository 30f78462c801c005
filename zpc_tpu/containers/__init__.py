"""Containers (reference layer 4, SURVEY §2.4)."""

from .field import Field, field
from .structured import StructuredField, structured_field
from .block_table import (BlockTable, build_block_table, build_overflowed,
                          pack_coords, unpack_key)
from .dense_field import DenseField, dense_field
from .index_buckets import (IndexBuckets, build_index_buckets,
                            neighbor_candidates)
from .bvh import (LBvh, build_lbvh, build_lbvh_complete,
                  query_overlaps, query_nearest,
                  query_ray, aabb_overlap, BvttFront)
from .ordered_map import OrderedMap, ordered_map, RingBuffer, ring_buffer
from .bvs import Bvs, build_bvs, bvs_query
