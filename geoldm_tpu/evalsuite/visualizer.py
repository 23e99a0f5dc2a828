"""Molecule visualization: xyz text files, 3D renders, chain GIFs.

Capability-parity with the reference visualizer (qm9/visualizer.py):
xyz save/load (:18-56), matplotlib 3D renders with bonds inferred from the
distance tables (:97-230), grids of molecules (:233-322) and chain GIFs via
imageio (:325-393). Rendering style is intentionally simplified; the file
formats match so tooling interoperates.
"""

from __future__ import annotations

import glob
import os
import random
from typing import List, Optional, Tuple

import numpy as np

from geoldm_tpu.evalsuite import bond_analyze as ba


def save_xyz_file(
    path: str,
    one_hot: np.ndarray,
    charges: Optional[np.ndarray],
    positions: np.ndarray,
    dataset_info,
    id_from: int = 0,
    name: str = "molecule",
    node_mask: Optional[np.ndarray] = None,
) -> List[str]:
    """Write one xyz-style .txt per molecule (reference format:
    'N\\n\\n' then 'El x y z' lines — qm9/visualizer.py:18-38)."""
    os.makedirs(path, exist_ok=True)
    one_hot = np.asarray(one_hot)
    positions = np.asarray(positions)
    if node_mask is not None:
        atomsxmol = np.asarray(node_mask).reshape(len(one_hot), -1).sum(axis=1)
    else:
        atomsxmol = [one_hot.shape[1]] * one_hot.shape[0]
    decoder = dataset_info["atom_decoder"]
    files = []
    for i in range(one_hot.shape[0]):
        fname = os.path.join(path, f"{name}_{i + id_from:03d}.txt")
        n = int(atomsxmol[i])
        types = np.argmax(one_hot[i], axis=1)
        with open(fname, "w") as f:
            f.write(f"{n}\n\n")
            for a in range(n):
                el = decoder[int(types[a])]
                x, y, z = positions[i, a]
                f.write(f"{el} {x:.9f} {y:.9f} {z:.9f}\n")
        files.append(fname)
    return files


def load_molecule_xyz(file: str, dataset_info) -> Tuple[np.ndarray, np.ndarray]:
    """-> (positions [n,3], one_hot [n,S]). reference: qm9/visualizer.py:41-56."""
    encoder = dataset_info["atom_encoder"]
    s = len(dataset_info["atom_decoder"])
    with open(file, encoding="utf8") as f:
        n = int(f.readline())
        f.readline()
        positions = np.zeros((n, 3), dtype=np.float32)
        one_hot = np.zeros((n, s), dtype=np.float32)
        for i in range(n):
            parts = f.readline().split()
            one_hot[i, encoder[parts[0]]] = 1.0
            positions[i] = [float(v) for v in parts[1:4]]
    return positions, one_hot


def load_xyz_files(path: str, shuffle: bool = True) -> List[str]:
    files = glob.glob(os.path.join(path, "*.txt"))
    if shuffle:
        random.shuffle(files)
    return files


def plot_molecule_3d(
    ax,
    positions: np.ndarray,
    atom_types: np.ndarray,
    dataset_info,
    alpha: float = 1.0,
    bg_color: str = "white",
) -> None:
    """Scatter atoms + draw inferred bonds on a 3D axis."""
    colors = np.array(dataset_info["colors_dic"])
    radii = np.array(dataset_info["radius_dic"])
    areas = 1500 * radii[atom_types] ** 2

    ax.scatter(
        positions[:, 0], positions[:, 1], positions[:, 2],
        s=areas, c=[colors[t] for t in atom_types], alpha=0.9 * alpha,
        edgecolors="#333333", linewidths=0.5,
    )
    orders = ba.pairwise_bond_orders(
        positions.astype(np.float64), atom_types, tuple(dataset_info["atom_decoder"])
    )
    if dataset_info["name"] == "geom":
        orders = np.minimum(orders, 1)
    line_color = "#666666" if bg_color == "white" else "#bbbbbb"
    for i in range(len(positions)):
        for j in range(i):
            order = orders[i, j]
            if order > 0:
                p, q = positions[i], positions[j]
                ax.plot(
                    [p[0], q[0]], [p[1], q[1]], [p[2], q[2]],
                    linewidth=0.5 + 1.5 * order, c=line_color, alpha=alpha,
                )


def plot_data3d(
    positions: np.ndarray,
    atom_types: np.ndarray,
    dataset_info,
    save_path: Optional[str] = None,
    camera_elev: float = 10,
    camera_azim: float = -60,
    bg: str = "white",
    alpha: float = 1.0,
):
    """Render one molecule to a file (or return the figure).
    reference: qm9/visualizer.py:156-230."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    ax.set_axis_off()
    ax.view_init(elev=camera_elev, azim=camera_azim)
    fig.patch.set_facecolor(bg)
    ax.set_facecolor(bg)

    plot_molecule_3d(ax, positions, atom_types, dataset_info, alpha=alpha, bg_color=bg)

    max_value = max(float(np.abs(positions).max()), 1e-3)
    axis_lim = min(40.0, max(max_value / 1.5 + 0.3, 3.2))
    ax.set_xlim(-axis_lim, axis_lim)
    ax.set_ylim(-axis_lim, axis_lim)
    ax.set_zlim(-axis_lim, axis_lim)

    if save_path is not None:
        plt.savefig(save_path, bbox_inches="tight", pad_inches=0.0, dpi=100)
        plt.close(fig)
        return None
    return fig


def visualize(
    path: str,
    dataset_info,
    max_num: int = 25,
    spheres_3d: bool = False,
) -> List[str]:
    """Render every xyz file in a directory to a png next to it.
    reference: qm9/visualizer.py:233-259."""
    out = []
    for file in load_xyz_files(path)[:max_num]:
        positions, one_hot = load_molecule_xyz(file, dataset_info)
        types = np.argmax(one_hot, axis=1)
        png = file.replace(".txt", ".png")
        plot_data3d(positions, types, dataset_info, save_path=png)
        out.append(png)
    return out


def visualize_chain(
    path: str,
    dataset_info,
    spheres_3d: bool = False,
    gif_name: str = "output",
) -> Optional[str]:
    """Render a chain directory (frame xyz files) into an animated GIF.
    reference: qm9/visualizer.py:325-351."""
    import imageio

    files = sorted(load_xyz_files(path, shuffle=False))
    if not files:
        return None
    pngs = []
    for file in files:
        positions, one_hot = load_molecule_xyz(file, dataset_info)
        types = np.argmax(one_hot, axis=1)
        png = file.replace(".txt", ".png")
        plot_data3d(positions, types, dataset_info, save_path=png)
        pngs.append(png)
    gif_path = os.path.join(os.path.dirname(files[0]), f"{gif_name}.gif")
    imgs = [imageio.v2.imread(p) for p in pngs]
    imageio.mimsave(gif_path, imgs, subrectangles=True)
    return gif_path


def visualize_chain_uncertainty(
    path: str,
    dataset_info,
    spheres_3d: bool = False,
    gif_name: str = "output",
    alpha: float = 0.5,
) -> Optional[str]:
    """Render a chain as an uncertainty GIF: each frame overlays THREE
    consecutive chain states at partial alpha, so per-step sampling
    variance shows as ghosting. reference: qm9/visualizer.py:354-393
    (used by the reference's eval_sample chains, eval_sample.py:42)."""
    import matplotlib

    matplotlib.use("Agg")
    import imageio
    import matplotlib.pyplot as plt

    files = sorted(load_xyz_files(path, shuffle=False))
    if len(files) < 3:
        return visualize_chain(path, dataset_info, spheres_3d, gif_name)
    pngs = []
    for i in range(len(files) - 2):
        frames = [load_molecule_xyz(f, dataset_info) for f in files[i : i + 3]]
        fig = plt.figure(figsize=(5, 5))
        ax = fig.add_subplot(projection="3d")
        ax.set_axis_off()
        ax.view_init(elev=10, azim=-60)
        fig.patch.set_facecolor("white")
        ax.set_facecolor("white")
        max_value = 1e-3
        for positions, one_hot in frames:
            types = np.argmax(one_hot, axis=1)
            plot_molecule_3d(ax, positions, types, dataset_info, alpha=alpha)
            max_value = max(max_value, float(np.abs(positions).max()))
        axis_lim = min(40.0, max(max_value / 1.5 + 0.3, 3.2))
        ax.set_xlim(-axis_lim, axis_lim)
        ax.set_ylim(-axis_lim, axis_lim)
        ax.set_zlim(-axis_lim, axis_lim)
        png = files[i].replace(".txt", ".png")
        plt.savefig(png, bbox_inches="tight", pad_inches=0.0, dpi=100)
        plt.close(fig)
        pngs.append(png)
    gif_path = os.path.join(os.path.dirname(files[0]), f"{gif_name}.gif")
    imgs = [imageio.v2.imread(p) for p in pngs]
    imageio.mimsave(gif_path, imgs, subrectangles=True)
    return gif_path


def save_chain(
    path: str,
    chain_one_hot: np.ndarray,
    chain_charges: np.ndarray,
    chain_x: np.ndarray,
    dataset_info,
) -> None:
    """Write chain frames as numbered xyz files for visualize_chain."""
    for i in range(len(chain_x)):
        save_xyz_file(
            path,
            chain_one_hot[i : i + 1],
            chain_charges[i : i + 1],
            chain_x[i : i + 1],
            dataset_info,
            id_from=i,
            name="chain",
        )
