"""import-torch CLI round trip: synthetic Lightning .ckpt -> orbax ->
load_variables -> forward."""

import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")


def test_import_torch_cli_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from torch import nn

    from voice100_tpu.models import TextToAlignText
    from voice100_tpu.tools.import_torch import cli_main as import_main
    from voice100_tpu.training.checkpoint import load_variables

    vocab, hidden = 29, 8

    # reference-shaped align model (voice100/models/_align_v2.py:14-23)
    class TorchAlign(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(vocab, hidden)
            self.lstm = nn.LSTM(hidden, hidden, num_layers=1,
                                bidirectional=True)
            self.dense = nn.Linear(2 * hidden, 2)

    torch.manual_seed(0)
    t_model = TorchAlign()
    ckpt_path = str(tmp_path / "align.ckpt")
    torch.save({"state_dict": t_model.state_dict(),
                "hyper_parameters": {"vocab_size": vocab}}, ckpt_path)

    cfg_path = str(tmp_path / "align.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "model": {"class_path": "voice100_tpu.models.TextToAlignText",
                      "init_args": {"vocab_size": vocab, "num_layers": 1,
                                    "hidden_size": hidden}},
            "data": {"class_path": "voice100_tpu.data.AlignTextDataModule",
                     "init_args": {"dataset": "dummy_en"}},
        }, f)

    out_dir = str(tmp_path / "orbax_ckpt")
    import_main([
        "--config", cfg_path, "--ckpt_path", ckpt_path,
        "--output", out_dir,
    ])
    assert os.path.isdir(out_dir)

    variables = load_variables(out_dir)
    model = TextToAlignText(vocab_size=vocab, num_layers=1,
                            hidden_size=hidden)
    text = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pred = model.apply(
        variables, text, jnp.asarray([4]), method=TextToAlignText.predict
    )
    assert pred.shape == (1, 4, 2)

    # numerics: matches the torch forward
    t_model.eval()
    with torch.no_grad():
        x = t_model.embedding(torch.tensor([[1, 2, 3, 4]]))
        out, _ = t_model.lstm(x.transpose(0, 1))
        t_pred = torch.exp(t_model.dense(out.transpose(0, 1))) - 1
    np.testing.assert_allclose(
        np.asarray(pred), t_pred.numpy(), rtol=1e-4, atol=1e-5
    )
