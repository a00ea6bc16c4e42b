from .config import (
    Config,
    CubeHeadConfig,
    DatasetsConfig,
    InputConfig,
    ModelConfig,
    PlotConfig,
    ROIBoxHeadConfig,
    ROIHeadsConfig,
    RPNConfig,
    ShapesConfig,
    SolverConfig,
    TestConfig,
    asdict,
    merge_from_list,
)
from .yaml_loader import load_config
