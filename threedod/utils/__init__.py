from . import convert_weights
