import zipfile

from walmart_retail_pyspark_sqlite_pipeline_spark.sources.acquire import (
    download_kaggle_competition,
    extract_archives,
    retain_files,
)


def test_extract_and_retain(tmp_path):
    z = tmp_path / "bundle.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("train.csv", "Store,Dept\n1,1\n")
        zf.writestr("readme.txt", "ignore me")

    assert extract_archives(tmp_path) == [z]
    assert (tmp_path / "train.csv").exists()

    kept = retain_files(tmp_path, ["*.csv"])
    assert [p.name for p in kept] == ["train.csv"]
    assert (tmp_path / "_ignored" / "readme.txt").exists()
    assert (tmp_path / "_ignored" / "bundle.zip").exists()


def test_download_degrades_without_cli(tmp_path):
    # no kaggle CLI in this environment -> False, no exception, dir created
    assert download_kaggle_competition("some-competition", tmp_path / "raw") is False
    assert (tmp_path / "raw").is_dir()
