"""Native C++ CSV loader vs pandas on the reference schema."""
import numpy as np
import pandas as pd
import pytest

from rankaae_tpu.data.dataset import load_split_arrays
from rankaae_tpu.data.native import load_csv_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable; pandas fallback covers this"
)


def test_native_payload_matches_pandas(synthetic_csv):
    cols, data = load_csv_native(synthetic_csv)
    df = pd.read_csv(synthetic_csv, index_col=[0, 1], comment="#")
    assert cols == df.columns.tolist()
    np.testing.assert_allclose(data, df.to_numpy().astype(np.float32), rtol=2e-6)


def test_split_arrays_identical_across_engines(synthetic_csv):
    a = load_split_arrays(synthetic_csv, n_aux=5, engine="native")
    b = load_split_arrays(synthetic_csv, n_aux=5, engine="pandas")
    for portion in ("train", "val", "test"):
        np.testing.assert_array_equal(a[portion].spec, b[portion].spec)
        np.testing.assert_array_equal(a[portion].aux, b[portion].aux)
        assert a[portion].atom_index == b[portion].atom_index
        np.testing.assert_array_equal(a[portion].grid, b[portion].grid)


def test_native_handles_comments_and_exponents(tmp_path):
    path = tmp_path / "tricky.csv"
    path.write_text(
        "# leading comment\n"
        "material,site,AUX_CT,ENE_1.00,ENE_2.00\n"
        "mp-1,0,1.5e-3,-2.75,+3.25E2\n"
        "# interior comment\n"
        "mp-1,1,nan,inf,-0.0\n"
    )
    cols, data = load_csv_native(str(path))
    assert cols == ["AUX_CT", "ENE_1.00", "ENE_2.00"]
    np.testing.assert_allclose(data[0], [1.5e-3, -2.75, 325.0], rtol=1e-6)
    assert np.isnan(data[1, 0]) and np.isinf(data[1, 1]) and data[1, 2] == 0.0


def test_native_missing_file_raises():
    with pytest.raises(RuntimeError):
        load_csv_native("/nonexistent/file.csv")
