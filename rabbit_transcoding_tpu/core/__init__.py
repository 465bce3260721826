from .pointset import PointSet
from .gof import GroupOfFrames
from .image import Image, Video
from .patch import Patch
