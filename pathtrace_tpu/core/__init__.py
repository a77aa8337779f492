from . import constants, rng, types, vecmath
