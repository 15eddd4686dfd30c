import math

from segmentation_training_pipeline_tpu.train import callbacks as cb


def _ctrl(lr=0.1):
    return cb.TrainingControl(base_lr=lr)


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = cb.EarlyStopping(monitor="val_loss", patience=2)
        c = _ctrl()
        for epoch, v in enumerate([1.0, 0.9, 0.95, 0.96, 0.97]):
            es.on_epoch_end(epoch, {"val_loss": v}, c)
        assert c.stop_training

    def test_no_stop_while_improving(self):
        es = cb.EarlyStopping(monitor="val_loss", patience=1)
        c = _ctrl()
        for epoch, v in enumerate([1.0, 0.9, 0.8, 0.7]):
            es.on_epoch_end(epoch, {"val_loss": v}, c)
        assert not c.stop_training

    def test_max_mode_auto(self):
        es = cb.EarlyStopping(monitor="val_dice", patience=0)
        c = _ctrl()
        es.on_epoch_end(0, {"val_dice": 0.5}, c)
        es.on_epoch_end(1, {"val_dice": 0.4}, c)
        assert c.stop_training


class TestReduceLROnPlateau:
    def test_reduces_after_patience(self):
        r = cb.ReduceLROnPlateau(monitor="val_loss", factor=0.5, patience=1)
        c = _ctrl(0.1)
        r.on_epoch_end(0, {"val_loss": 1.0}, c)
        r.on_epoch_end(1, {"val_loss": 1.1}, c)
        assert math.isclose(c.effective_lr, 0.05)

    def test_min_lr_floor(self):
        r = cb.ReduceLROnPlateau(monitor="val_loss", factor=0.1, patience=0,
                                 min_lr=0.05)
        c = _ctrl(0.1)
        r.on_epoch_end(0, {"val_loss": 1.0}, c)
        r.on_epoch_end(1, {"val_loss": 1.1}, c)
        r.on_epoch_end(2, {"val_loss": 1.2}, c)
        assert math.isclose(c.effective_lr, 0.05)


class TestCyclicLR:
    def test_triangle_wave(self):
        clr = cb.CyclicLR(base_lr=0.0, max_lr=1.0, step_size=10)
        c = _ctrl(0.5)
        vals = []
        for step in range(21):
            c.global_step = step
            clr.on_batch_begin(c)
            vals.append(c.effective_lr)
        assert math.isclose(vals[0], 0.0)
        assert math.isclose(vals[10], 1.0)
        assert math.isclose(vals[20], 0.0, abs_tol=1e-9)


class TestLRVariator:
    def test_linear_ramp(self):
        v = cb.LRVariator(fromVal=0.0, toVal=1.0, steps=10)
        c = _ctrl(0.5)
        c.global_step = 5
        v.on_batch_begin(c)
        assert math.isclose(c.effective_lr, 0.5)


def test_terminate_on_nan():
    t = cb.TerminateOnNaN()
    c = _ctrl()
    t.on_epoch_end(0, {"loss": float("nan")}, c)
    assert c.stop_training


def test_csv_logger(tmp_path):
    path = str(tmp_path / "m.csv")
    c = _ctrl(0.01)
    log = cb.CSVLogger(path)
    log.on_train_begin(c)
    log.on_epoch_end(0, {"loss": 0.5, "val_loss": 0.6}, c)
    log.on_epoch_end(1, {"loss": 0.4, "val_loss": 0.5}, c)
    log.on_train_end(c)
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "epoch,lr,loss,val_loss"
    assert lines[1].startswith("0,0.01,0.5")


def test_instantiate_from_spec(tmp_path):
    c = cb.instantiate({"name": "EarlyStopping", "args": {"patience": 3}}, ".")
    assert isinstance(c, cb.EarlyStopping) and c.patience == 3
    assert cb.instantiate({"name": "ModelCheckpoint", "args": {}}, ".") is None


def test_csv_logger_append_resume(tmp_path):
    """Crash-resume must extend the metrics history, not truncate it, and
    must not write a second header mid-file."""
    path = str(tmp_path / "metrics.csv")
    ctrl = _ctrl()
    c = cb.CSVLogger(path)
    c.on_train_begin(ctrl)
    c.on_epoch_end(0, {"loss": 1.0, "dice": 0.1}, ctrl)
    c.on_train_end(ctrl)

    c2 = cb.CSVLogger(path, append=True)
    c2.on_train_begin(ctrl)
    c2.on_epoch_end(1, {"loss": 0.5, "dice": 0.4}, ctrl)
    c2.on_train_end(ctrl)

    lines = open(path).read().strip().splitlines()
    assert len(lines) == 3
    assert lines[0].startswith("epoch,lr,")
    assert all(not ln.startswith("epoch") for ln in lines[1:])
    # appended row follows the ORIGINAL column order
    assert lines[2].split(",")[2:] == ["0.5", "0.4"]


class TestCyclicLRModes:
    """Property tests from the published CLR semantics (Smith 2017 /
    keras-contrib README): triangular2 halves the amplitude each cycle,
    exp_range scales it by gamma^iteration.  Not fully de-circularizable
    with the reference mount empty, but these pin the DOCUMENTED contract
    so refactors can't silently drift."""

    def test_triangular2_amplitude_halves_per_cycle(self):
        clr = cb.CyclicLR(base_lr=0.0, max_lr=1.0, step_size=10,
                          mode="triangular2")
        c = _ctrl(0.5)
        peaks = []
        for cycle in range(3):
            c.global_step = cycle * 20 + 10  # mid-cycle peak
            clr.on_batch_begin(c)
            peaks.append(c.effective_lr)
        assert math.isclose(peaks[0], 1.0)
        assert math.isclose(peaks[1], 0.5)
        assert math.isclose(peaks[2], 0.25)

    def test_exp_range_gamma_decay(self):
        g = 0.99
        clr = cb.CyclicLR(base_lr=0.0, max_lr=1.0, step_size=10,
                          mode="exp_range", gamma=g)
        c = _ctrl(0.5)
        c.global_step = 10
        clr.on_batch_begin(c)
        assert math.isclose(c.effective_lr, g ** 10)
        c.global_step = 30
        clr.on_batch_begin(c)
        assert math.isclose(c.effective_lr, g ** 30)

    def test_base_lr_floor_nonzero(self):
        clr = cb.CyclicLR(base_lr=0.2, max_lr=1.0, step_size=5)
        c = _ctrl(0.5)
        for step in (0, 10, 20):  # cycle boundaries sit at base_lr
            c.global_step = step
            clr.on_batch_begin(c)
            assert math.isclose(c.effective_lr, 0.2)


class TestLRVariatorStyles:
    def test_cos_style_midpoint_and_ends(self):
        v = cb.LRVariator(fromVal=0.0, toVal=1.0, steps=10, style="cos")
        c = _ctrl(0.5)
        for step, want in ((0, 0.0), (5, 0.5), (10, 1.0), (15, 1.0)):
            c.global_step = step
            v.on_batch_begin(c)
            assert math.isclose(c.effective_lr, want, abs_tol=1e-9), step

    def test_from_defaults_to_config_lr(self):
        v = cb.LRVariator(toVal=1.0, steps=10)
        c = _ctrl(0.5)  # base lr 0.5
        c.global_step = 0
        v.on_batch_begin(c)
        assert math.isclose(c.effective_lr, 0.5)
