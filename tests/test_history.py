"""History store unit tests (analogue of test_SimulationHistory.cu:12-125)."""
import numpy as np

from murb_tpu.core.history import (
    CSV_HEADER,
    MultiGalaxySimulationHistory,
    SimulationHistory,
)


def test_getters_setters_and_resize():
    h = SimulationHistory(4)
    assert h.num_iterations == 4
    h.set_energy_at(2, -1.5e40)
    h.set_ang_momentum_at(2, 7.0e45)
    h.set_density_center_at(2, [1.0, 2.0, 3.0])
    assert h.get_energy_at(2) == -1.5e40
    assert h.get_ang_momentum_at(2) == 7.0e45
    np.testing.assert_array_equal(h.get_density_center_at(2), [1, 2, 3])
    # resize preserves the prefix (ref: setNumIterations semantics)
    h.set_num_iterations(6)
    assert h.num_iterations == 6
    assert h.get_energy_at(2) == -1.5e40
    h.set_num_iterations(2)
    assert h.num_iterations == 2


def test_csv_roundtrip(tmp_path):
    """Exact reference column schema
    (ref: src/common/core/SimulationHistory.cpp:110)."""
    h = SimulationHistory(3)
    for i in range(3):
        h.set_energy_at(i, -1e40 * (i + 1))
        h.set_ang_momentum_at(i, 2e45 * (i + 1))
        h.set_density_center_at(i, [i, 2 * i, 3 * i])
    path = tmp_path / "metrics.csv"
    h.save_metrics_to_csv(str(path))
    lines = path.read_text().strip().split("\n")
    assert lines[0] == CSV_HEADER
    assert len(lines) == 4
    h2 = SimulationHistory.load_metrics_from_csv(str(path))
    np.testing.assert_allclose(h2.energies, h.energies)
    np.testing.assert_allclose(h2.density_centers, h.density_centers)


def test_multi_galaxy_aggregation():
    """Element-wise sum across galaxies
    (ref: SimulationHistory.cpp:153-184 updateGlobalProperties)."""
    h = MultiGalaxySimulationHistory(3, num_galaxies=2)
    for g, scale in ((0, 1.0), (1, 10.0)):
        gal = h.get_galaxy(g)
        for i in range(3):
            gal.set_energy_at(i, scale * (i + 1))
            gal.set_ang_momentum_at(i, scale * (i + 2))
            gal.set_density_center_at(i, [scale, scale * 2, scale * 3])
    h.update_global_properties()
    np.testing.assert_allclose(h.energies, [11.0, 22.0, 33.0])
    np.testing.assert_allclose(h.ang_momentums, [22.0, 33.0, 44.0])
    np.testing.assert_allclose(h.density_centers[0], [11.0, 22.0, 33.0])
