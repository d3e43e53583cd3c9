//! Host-side NMS + annotation for decoded detections (equivalent role to
//! the reference's src/yolo_result.rs).

use image::{Rgb, RgbImage};

#[derive(Debug, Clone)]
pub struct Detection {
    pub x1: f32,
    pub y1: f32,
    pub x2: f32,
    pub y2: f32,
    pub conf: f32,
    pub class: usize,
}

fn iou(a: &Detection, b: &Detection) -> f32 {
    let ix = (a.x2.min(b.x2) - a.x1.max(b.x1)).max(0.0);
    let iy = (a.y2.min(b.y2) - a.y1.max(b.y1)).max(0.0);
    let inter = ix * iy;
    let ua = (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1) - inter;
    inter / (ua + 1e-9)
}

/// Greedy class-aware hard NMS, highest confidence first.
pub fn nms(mut dets: Vec<Detection>, thr: f32) -> Vec<Detection> {
    dets.sort_by(|a, b| b.conf.total_cmp(&a.conf));
    let mut keep: Vec<Detection> = Vec::new();
    'outer: for d in dets {
        for k in &keep {
            if k.class == d.class && iou(k, &d) > thr {
                continue 'outer;
            }
        }
        keep.push(d);
    }
    keep
}

const PALETTE: [[u8; 3]; 6] = [
    [56, 168, 255],
    [255, 112, 31],
    [72, 249, 10],
    [255, 55, 199],
    [255, 178, 29],
    [26, 147, 52],
];

/// Draw 2px box outlines color-keyed by class.
pub fn draw(mut img: RgbImage, dets: &[Detection]) -> RgbImage {
    let (w, h) = (img.width() as i32, img.height() as i32);
    for d in dets {
        let color = Rgb(PALETTE[d.class % PALETTE.len()]);
        let (x1, y1, x2, y2) = (d.x1 as i32, d.y1 as i32, d.x2 as i32, d.y2 as i32);
        for t in 0..2 {
            for x in x1..=x2 {
                for &y in &[y1 + t, y2 - t] {
                    if x >= 0 && x < w && y >= 0 && y < h {
                        img.put_pixel(x as u32, y as u32, color);
                    }
                }
            }
            for y in y1..=y2 {
                for &x in &[x1 + t, x2 - t] {
                    if x >= 0 && x < w && y >= 0 && y < h {
                        img.put_pixel(x as u32, y as u32, color);
                    }
                }
            }
        }
    }
    img
}
