//! ORT session wrapper: letterbox preprocess, forward, decode + NMS.
//!
//! The exported graph's output is the fused head tensor
//! `(batch, 4 + nc, anchors)` — cx, cy, w, h in letterboxed pixels followed
//! by per-class scores (see export/onnx_export.py). Equivalent role to the
//! reference's src/{model,ort_backend}.rs, rebuilt for ort 2.x.

use anyhow::{Context, Result};
use image::{imageops, RgbImage};
use ndarray::{Array4, ArrayView2, Axis};
use ort::session::{builder::GraphOptimizationLevel, Session};

use crate::postprocess::{nms, Detection};

pub struct Yolo {
    session: Session,
    imgsz: u32,
}

impl Yolo {
    pub fn new(path: &str, imgsz: u32) -> Result<Self> {
        let session = Session::builder()?
            .with_optimization_level(GraphOptimizationLevel::Level3)?
            .commit_from_file(path)
            .with_context(|| format!("loading {path}"))?;
        Ok(Self { session, imgsz })
    }

    /// Square letterbox (gray 114 pad, centered) -> NCHW f32 in [0, 1].
    /// Returns the tensor plus (gain, pad_x, pad_y) for box rescaling.
    fn preprocess(&self, img: &RgbImage) -> (Array4<f32>, f32, f32, f32) {
        let (w0, h0) = (img.width() as f32, img.height() as f32);
        let s = self.imgsz as f32;
        let gain = (s / w0).min(s / h0);
        let (nw, nh) = ((w0 * gain).round() as u32, (h0 * gain).round() as u32);
        let resized = imageops::resize(img, nw, nh, imageops::FilterType::Triangle);
        let (px, py) = ((s as u32 - nw) / 2, (s as u32 - nh) / 2);

        let mut input =
            Array4::<f32>::from_elem((1, 3, self.imgsz as usize, self.imgsz as usize), 114.0 / 255.0);
        for (x, y, p) in resized.enumerate_pixels() {
            let (xi, yi) = ((x + px) as usize, (y + py) as usize);
            for c in 0..3 {
                input[[0, c, yi, xi]] = p.0[c] as f32 / 255.0;
            }
        }
        (input, gain, px as f32, py as f32)
    }

    pub fn run(&mut self, img: &RgbImage, conf: f32, iou: f32) -> Result<Vec<Detection>> {
        let (input, gain, px, py) = self.preprocess(img);
        let outputs = self
            .session
            .run(ort::inputs!["images" => input.view()]?)?;
        let out = outputs[0].try_extract_tensor::<f32>()?;
        // (1, 4+nc, anchors) -> (anchors, 4+nc)
        let out = out.index_axis(Axis(0), 0);
        let out = out.t();
        let mut dets = decode(out.view(), conf, gain, px, py, img.width(), img.height());
        dets = nms(dets, iou);
        Ok(dets)
    }
}

/// Decode fused head rows (cx, cy, w, h, scores...) above `conf`, rescaled
/// from letterbox to original-image coordinates.
fn decode(
    rows: ArrayView2<f32>,
    conf: f32,
    gain: f32,
    px: f32,
    py: f32,
    w0: u32,
    h0: u32,
) -> Vec<Detection> {
    let nc = rows.ncols() - 4;
    let mut dets = Vec::new();
    for row in rows.outer_iter() {
        let (mut best, mut best_c) = (0.0f32, 0usize);
        for c in 0..nc {
            if row[4 + c] > best {
                best = row[4 + c];
                best_c = c;
            }
        }
        if best < conf {
            continue;
        }
        let (cx, cy, w, h) = (row[0], row[1], row[2], row[3]);
        dets.push(Detection {
            x1: ((cx - w / 2.0 - px) / gain).clamp(0.0, w0 as f32),
            y1: ((cy - h / 2.0 - py) / gain).clamp(0.0, h0 as f32),
            x2: ((cx + w / 2.0 - px) / gain).clamp(0.0, w0 as f32),
            y2: ((cy + h / 2.0 - py) / gain).clamp(0.0, h0 as f32),
            conf: best,
            class: best_c,
        });
    }
    dets
}
