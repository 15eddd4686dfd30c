from .datasets import (
    PredictionItem,
    DataSet,
    CompositeDataSet,
    CSVRLEDataSet,
    SubDataSet,
    DirectoryDataSet,
    KFoldedDataSet,
    kfold_indices,
)
