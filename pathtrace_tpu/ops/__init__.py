from . import intersect, bsdf
