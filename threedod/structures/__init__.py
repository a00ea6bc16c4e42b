from .cubes import Cubes
