from .datasets import (
    PredictionItem,
    DataSet,
    CompositeDataSet,
    SubDataSet,
    DirectoryDataSet,
    KFoldedDataSet,
    kfold_indices,
)
