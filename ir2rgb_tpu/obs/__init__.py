from .html import HTMLPage
from .video import MJPEGAviWriter, read_mjpeg_avi
from .visualizer import Visualizer
from .writer import AsyncImageWriter

__all__ = ["Visualizer", "HTMLPage", "AsyncImageWriter",
           "MJPEGAviWriter", "read_mjpeg_avi"]
