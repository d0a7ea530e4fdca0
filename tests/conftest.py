import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_toolkit_spark.session import get_spark

    s = get_spark(app_name="ocr_toolkit_spark_tests", master="local[8]",
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_docs():
    from ocr_toolkit_spark.fixtures import generate_documents

    return generate_documents(n_docs=300, seed=42)


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="ots_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
