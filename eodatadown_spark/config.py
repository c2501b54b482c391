"""System configuration (EODataDownSystemMain analog).

The reference parses a signed JSON config: an MD5 signature file guards
against tampering (eodatadownutils.py:594-658, enforced
eodatadownsystemmain.py:102-104), then sensors are built by name dispatch
(:157-186).  Same contract here over the Spark engine:

    {
      "catalog_path": "/data/eodd_catalog",
      "sensors": ["LandsatGOOG", "Sentinel2GOOG"],
      "roi": {"west_lon": -5.0, "east_lon": 0.5,
              "south_lat": 45.0, "north_lat": 50.5},
      "plugins": ["PlgA"]
    }
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from eodatadown_spark.catalog import ParquetCatalog
from eodatadown_spark.sensor import SensorBase, get_sensor_obj


def sign_config(config_file: str) -> str:
    """Write the MD5 signature sidecar (`<file>.sig`); returns the hex."""
    with open(config_file, "rb") as fh:
        digest = hashlib.md5(fh.read()).hexdigest()
    with open(config_file + ".sig", "w", encoding="utf-8") as fh:
        fh.write(digest)
    return digest


def check_config_signature(config_file: str) -> bool:
    sig_file = config_file + ".sig"
    if not os.path.exists(sig_file):
        return False
    with open(config_file, "rb") as fh:
        digest = hashlib.md5(fh.read()).hexdigest()
    with open(sig_file, encoding="utf-8") as fh:
        return fh.read().strip() == digest


@dataclass
class SystemConfig:
    catalog_path: str
    sensors: list[str] = field(default_factory=list)
    roi: dict | None = None
    plugins: list[str] = field(default_factory=list)
    # very-large-catalog knob: p_year/p_month two-level partitioning
    partition_monthly: bool = False


class SystemMain:
    """parse_config + sensor construction + shared catalog handle."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.config: SystemConfig | None = None
        self.catalog: ParquetCatalog | None = None

    def parse_config(self, config_file: str, require_signature: bool = True) -> "SystemMain":
        if require_signature and not check_config_signature(config_file):
            raise ValueError(
                f"config signature missing or mismatched for {config_file} "
                "(run sign_config, or pass require_signature=False)"
            )
        with open(config_file, encoding="utf-8") as fh:
            raw = json.load(fh)
        self.config = SystemConfig(
            catalog_path=raw["catalog_path"],
            sensors=list(raw.get("sensors", [])),
            roi=raw.get("roi"),
            plugins=list(raw.get("plugins", [])),
            partition_monthly=bool(raw.get("partition_monthly", False)),
        )
        self.catalog = ParquetCatalog(
            self.spark,
            self.config.catalog_path,
            partition_monthly=self.config.partition_monthly,
        )
        return self

    def get_sensor_objs(self) -> list[SensorBase]:
        assert self.config is not None and self.catalog is not None
        return [get_sensor_obj(name, self.catalog) for name in self.config.sensors]

    def get_roi_df(self):
        assert self.config is not None
        if not self.config.roi:
            return None
        from eodatadown_spark import schemas

        row = {"roi_id": 1, "name": "config-roi", "wkt": None, **self.config.roi}
        return self.spark.createDataFrame([row], schema=schemas.ROI_POLYGONS)
