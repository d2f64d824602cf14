"""MLflow run parameters — reference `common/mlflow_parameters.py:4-16`."""

from .utils import get_timestamp


class MLflowParameters:
    def __init__(
        self,
        tracking_uri: str = "mlruns",
        username: str = None,
        password: str = None,
        experiment: str = None,
    ) -> None:
        self.tracking_uri = tracking_uri
        self.username = username
        self.password = password
        self.experiment = experiment or f"experiment-{get_timestamp()}"
