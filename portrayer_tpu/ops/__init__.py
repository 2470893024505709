from .intersect import intersect_scene, occluded, hit_detail, Hit, HitDetail
from .shade import shade_hits
from .trace import trace
