from .qnet import QNetTrainer, QNetTrainState

__all__ = ["QNetTrainer", "QNetTrainState"]
