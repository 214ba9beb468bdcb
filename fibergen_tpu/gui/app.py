"""GUI application entry.

With PyQt5 available: a minimal IDE in the spirit of the reference GUI
(lib/fibergen_gui.py): XML editor, demo browser, run button with live
convergence output, and matplotlib slice tabs.  Without Qt (as in headless
TPU environments): falls back to running the project and opening the
matplotlib slice viewer.
"""
from __future__ import annotations

import sys

from ..api import FG
from ..utils.logging import LOG
from .viewer import SliceViewer, list_demos


def run_project_and_view(path: str, show: bool = True):
    """Run a project and open the slice viewer.  Honors the project's
    <view> block, including <record_loadstep>: per-loadstep snapshots of
    the viewed field are captured through the loadstep callback exactly
    like the reference GUI (lib/fibergen_gui.py runProject <view> support)."""
    fg = FG()
    fg.load_xml(path)
    record = None
    try:
        view = fg.project.root.find("view")
        e = view.find("record_loadstep") if view is not None else None
        if e is not None and (e.text or "").strip() not in ("", "0", "false"):
            record = (e.text or "epsilon").strip()
            if record in ("1", "true"):
                fld = view.find("field")
                record = (fld.text.strip().rstrip("0123456789")
                          if fld is not None and fld.text else "epsilon")
    except Exception:  # noqa: BLE001 - malformed <view> is non-fatal
        record = None
    snapshots = []
    if record:
        def _snap():
            try:
                snapshots.append(fg.get_field(record).copy())
            except Exception:  # noqa: BLE001
                pass
            return False
        fg.set_loadstep_callback(_snap)
    fg.run()
    viewer = SliceViewer.from_fg(fg)
    viewer.loadsteps = snapshots
    if show:
        viewer.show()
    return fg, viewer


def make_xml_highlighter(document):
    """XML syntax highlighter for the editor (the reference's
    XMLHighlighter, fibergen_gui.py:1617-1772): tags, attribute names,
    quoted values, and comments get distinct colors."""
    from PyQt5 import QtCore, QtGui

    rules = []

    def fmt(color, bold=False, italic=False):
        f = QtGui.QTextCharFormat()
        f.setForeground(QtGui.QColor(color))
        if bold:
            f.setFontWeight(QtGui.QFont.Bold)
        if italic:
            f.setFontItalic(True)
        return f

    rules.append((QtCore.QRegExp(r"<[/!?]?\b[A-Za-z_][\w.-]*"),
                  fmt("#000080", bold=True)))
    rules.append((QtCore.QRegExp(r"/?>"), fmt("#000080", bold=True)))
    rules.append((QtCore.QRegExp(r"\b[A-Za-z_][\w.-]*(?==)"),
                  fmt("#806000")))
    rules.append((QtCore.QRegExp(r'"[^"]*"'), fmt("#008000")))
    comment_fmt = fmt("#808080", italic=True)

    class XMLHighlighter(QtGui.QSyntaxHighlighter):
        def highlightBlock(self, text):
            for rx, f in rules:
                i = rx.indexIn(text, 0)
                while i >= 0:
                    n = rx.matchedLength()
                    self.setFormat(i, n, f)
                    i = rx.indexIn(text, i + n)
            # multi-line comments via block state
            start_rx = QtCore.QRegExp(r"<!--")
            end_rx = QtCore.QRegExp(r"-->")
            self.setCurrentBlockState(0)
            start = 0 if self.previousBlockState() == 1 else start_rx.indexIn(text)
            while start >= 0:
                end = end_rx.indexIn(text, start)
                if end == -1:
                    self.setCurrentBlockState(1)
                    length = len(text) - start
                else:
                    length = end - start + 3
                self.setFormat(start, length, comment_fmt)
                start = start_rx.indexIn(text, start + length)

    return XMLHighlighter(document)


def make_plot_tab(viewer, QtWidgets):
    """Embedded matplotlib slice-viewer tab (the reference's PlotWidget,
    fibergen_gui.py:525-1616): field/component/slice selectors, colormap,
    contrast, interpolation, live redraw on an embedded canvas."""
    from matplotlib.backends.backend_qt5agg import FigureCanvasQTAgg
    from matplotlib.figure import Figure

    w = QtWidgets.QWidget()
    fig = Figure(figsize=(5, 4))
    canvas = FigureCanvasQTAgg(fig)

    field_box = QtWidgets.QComboBox()
    field_box.addItems(list(viewer.fields))
    comp_box = QtWidgets.QSpinBox()
    comp_box.setRange(0, 8)
    dim_box = QtWidgets.QComboBox()
    dim_box.addItems(["x", "y", "z"])
    dim_box.setCurrentText(viewer.slice_dim)
    slider = QtWidgets.QSlider(0x1)  # horizontal
    slider.setRange(0, 100)
    slider.setValue(int(viewer.slice_index * 100))
    cmap_box = QtWidgets.QComboBox()
    cmap_box.addItems(["jet", "viridis", "coolwarm", "gray"])
    interp = QtWidgets.QCheckBox("interpolate")

    def redraw(*_a):
        viewer.field = field_box.currentText()
        ncomp = viewer.fields[viewer.field].shape[0]
        comp_box.setMaximum(max(0, ncomp - 1))
        viewer.component = min(comp_box.value(), ncomp - 1)
        viewer.slice_dim = dim_box.currentText()
        viewer.slice_index = slider.value() / 100.0
        viewer.colormap = cmap_box.currentText()
        viewer.interpolate = interp.isChecked()
        fig.clf()
        viewer.render(fig.add_subplot(111))
        canvas.draw_idle()

    for wd, sig in ((field_box, "currentIndexChanged"),
                    (comp_box, "valueChanged"),
                    (dim_box, "currentIndexChanged"),
                    (slider, "valueChanged"),
                    (cmap_box, "currentIndexChanged"),
                    (interp, "stateChanged")):
        getattr(wd, sig).connect(redraw)

    bar = QtWidgets.QHBoxLayout()
    for wd in (field_box, comp_box, dim_box, slider, cmap_box, interp):
        bar.addWidget(wd)
    lay = QtWidgets.QVBoxLayout()
    lay.addLayout(bar)
    lay.addWidget(canvas)
    w.setLayout(lay)
    redraw()
    return w


def _qt_app(argv):
    import os

    from PyQt5 import QtWidgets  # noqa: F401 - optional dependency

    from . import help as helpmod

    class MainWindow(QtWidgets.QMainWindow):
        def __init__(self):
            super().__init__()
            self.setWindowTitle("fibergen_tpu")
            self.editor = QtWidgets.QPlainTextEdit()
            self._highlighter = make_xml_highlighter(self.editor.document())
            self.editor.cursorPositionChanged.connect(self.update_help)
            self.output = QtWidgets.QPlainTextEdit()
            self.output.setReadOnly(True)
            # context-help pane driven by doc/fileformat.xml
            # (the reference's HelpWidget, fibergen_gui.py:1945-2318)
            self.help_pane = QtWidgets.QPlainTextEdit()
            self.help_pane.setReadOnly(True)
            # demo browser (fibergen_gui.py:2381-2682)
            self.demos = QtWidgets.QTreeWidget()
            self.demos.setHeaderLabels(["Demos"])
            self.demos.itemDoubleClicked.connect(self.open_demo)
            self._fill_demos()
            run_btn = QtWidgets.QPushButton("Run")
            run_btn.clicked.connect(self.run_project)
            open_btn = QtWidgets.QPushButton("Open...")
            open_btn.clicked.connect(self.open_project)
            view_btn = QtWidgets.QPushButton("View results")
            view_btn.clicked.connect(self.view_results)
            bar = QtWidgets.QHBoxLayout()
            for b in (open_btn, run_btn, view_btn):
                bar.addWidget(b)
            lay = QtWidgets.QVBoxLayout()
            lay.addLayout(bar)
            right = QtWidgets.QSplitter()
            right.setOrientation(0x2)  # vertical
            right.addWidget(self.help_pane)
            right.addWidget(self.output)
            split = QtWidgets.QSplitter()
            split.addWidget(self.demos)
            split.addWidget(self.editor)
            split.addWidget(right)
            split.setSizes([150, 500, 300])
            lay.addWidget(split)
            w = QtWidgets.QWidget()
            w.setLayout(lay)
            # project + result tabs (the reference IDE keeps one result tab
            # per run, fibergen_gui.py:3047-3246)
            self.tabs = QtWidgets.QTabWidget()
            self.tabs.setTabsClosable(True)
            self.tabs.tabCloseRequested.connect(self._close_tab)
            self.tabs.addTab(w, "Project")
            self.setCentralWidget(self.tabs)
            self.fg = None
            self._results = 0

        def _close_tab(self, i):
            if i > 0:
                self.tabs.removeTab(i)

        def _fill_demos(self):
            from PyQt5 import QtWidgets as QW
            demo_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                                    "demo")
            if not os.path.isdir(demo_dir):
                return
            from PyQt5 import QtCore, QtGui
            self.demos.setIconSize(QtCore.QSize(48, 48))
            for cat in list_demos(demo_dir):
                top = QW.QTreeWidgetItem([cat["title"]])
                self.demos.addTopLevelItem(top)
                for p in cat["projects"]:
                    item = QW.QTreeWidgetItem([p["title"]])
                    item.setData(0, 0x0100, p["path"])  # UserRole
                    thumb = os.path.join(os.path.dirname(p["path"]),
                                         "thumbnail.png")
                    if os.path.isfile(thumb):
                        item.setIcon(0, QtGui.QIcon(thumb))
                    top.addChild(item)
            self.demos.expandAll()

        def open_demo(self, item, _col):
            path = item.data(0, 0x0100)
            if path:
                with open(path) as f:
                    self.editor.setPlainText(f.read())

        def update_help(self):
            text = self.editor.toPlainText()
            pos = self.editor.textCursor().position()
            try:
                self.help_pane.setPlainText(helpmod.help_at(text, pos))
            except Exception as e:  # noqa: BLE001 - help must never crash
                self.help_pane.setPlainText(f"(help unavailable: {e})")

        def open_project(self):
            path, _ = QtWidgets.QFileDialog.getOpenFileName(
                self, "Open project", "", "Project files (*.xml *.py)")
            if path:
                with open(path) as f:
                    self.editor.setPlainText(f.read())

        def run_project(self):
            self.fg = FG()
            self.fg.set_xml(self.editor.toPlainText())

            def conv_cb():
                QtWidgets.QApplication.processEvents()
                return False

            self.fg.set_convergence_callback(conv_cb)
            try:
                self.fg.run()
                self.output.appendPlainText("done; residuals: "
                                            + str(len(self.fg.get_residuals())))
            except Exception as e:  # noqa: BLE001
                self.output.appendPlainText(f"ERROR: {e}")

        def view_results(self):
            if self.fg is None:
                return
            try:
                viewer = SliceViewer.from_fg(self.fg)
            except ValueError as e:
                self.output.appendPlainText(str(e))
                return
            self._results += 1
            tab = make_plot_tab(viewer, QtWidgets)
            self.tabs.addTab(tab, f"Results {self._results}")
            self.tabs.setCurrentWidget(tab)

    app = QtWidgets.QApplication(argv)
    win = MainWindow()
    if len(argv) > 1:
        with open(argv[1]) as f:
            win.editor.setPlainText(f.read())
    win.show()
    return app.exec_()


def main(argv=None):
    argv = list(sys.argv if argv is None else argv)
    try:
        import PyQt5  # noqa: F401
        has_qt = True
    except ImportError:
        has_qt = False

    if has_qt:
        return _qt_app(argv)

    LOG.info("PyQt5 not available: using the matplotlib viewer")
    if len(argv) > 1:
        run_project_and_view(argv[1])
        return 0
    # no project: print the demo browser listing
    import os
    demo_dir = os.path.join(os.path.dirname(__file__), "..", "..", "demo")
    if os.path.isdir(demo_dir):
        for cat in list_demos(demo_dir):
            print(f"[{cat['title']}]")
            for p in cat["projects"]:
                print(f"  {p['title']}: {p['path']}")
    print("usage: python -m fibergen_tpu.gui.app <project.xml>")
    return 0


if __name__ == "__main__":
    sys.exit(main())
